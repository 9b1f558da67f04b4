"""denet_tpu: a TPU-native (JAX/XLA/Pallas) re-implementation of the DeNet
object detection / classification framework.

Capabilities mirror the reference DeNet library (directed sparse sampling
detection, Fitness NMS, bounded IoU loss — see /root/reference) but the
architecture is built TPU-first:

  * functional layers over explicit parameter/state pytrees (no global
    shared variables), one jit-compiled train step,
  * Pallas kernels + XLA ops for the custom device ops (sparse bbox
    sampling, pool-inv upsampling, fused BN+ReLU),
  * C++ host extensions (ctypes ABI) for the corner->bbox search and NMS,
  * GSPMD mesh data-parallelism over ICI instead of worker processes.
"""

__version__ = "0.1.0"
