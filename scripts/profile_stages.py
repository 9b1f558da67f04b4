"""Stage-level device timing of the fused detection pipeline @512 b8.

Run on the real TPU (PYTHONPATH=/root/repo:/root/.axon_site).  Each timed
window ends with a scalar read (block_until_ready does not force remote
execution on the relay link).  Used to find the gather/NMS/stem bottlenecks
— see PERF.md "Corner-search gather rewrite" and the S2D-stem section.
"""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import denet_tpu.utils.logging as logging
from __graft_entry__ import _build_detect_model
from bench import perturb_heads_host, calibrate_corner_bias_device
from denet_tpu.core.model import _keepalive

logging.init(level="warning")
batch, size = 8, 512
model = _build_detect_model(batch, size, class_num=80, variant="skip")
model.compute_dtype = jnp.bfloat16
detect_layer = model.layers[-1]
sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
perturb_heads_host(model)
model.ensure_on_device()
rng = numpy.random.RandomState(3)
x = jnp.asarray(rng.randint(0, 256, (batch, 3, size, size)).astype(numpy.uint8))
calibrate_corner_bias_device(model, x)

def timeit(name, fn, args, iters=30, read=lambda r: r):
    r = fn(*args); jax.block_until_ready(r)
    numpy.asarray(jax.tree_util.tree_leaves(read(r))[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(read(r))[0]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print("%-28s %7.2f ms/batch  (%6.1f img/s)" % (name, 1000*dt, batch/dt), flush=True)
    return r

# 1. trunk + corner head only
dnc = sparse.corner_layer
corner_fn = _keepalive(model.build_corner_fn(dnc.layer_index, train=False, return_sample=True))
timeit("trunk+corner", corner_fn, (model.params, model.state, x))

# 2. full pipeline
full = _keepalive(model.build_full_detect_fn(detect_layer, 0.01, 0.5, corner_k=256, top_m=128, top_n=100))
timeit("full pipeline", full, (model.params, model.state, x))

# 3. full pipeline, no NMS (nms_threshold outside (0,1) -> threshold-only)
full_nonms = _keepalive(model.build_full_detect_fn(detect_layer, 0.01, 1.5, corner_k=256, top_m=128, top_n=100))
timeit("full, no NMS scan", full_nonms, (model.params, model.state, x))

# 4. full pipeline with smaller corner_k
full_k128 = _keepalive(model.build_full_detect_fn(detect_layer, 0.01, 0.5, corner_k=128, top_m=128, top_n=100))
timeit("full, corner_k=128", full_k128, (model.params, model.state, x))

# 5. full with top_m=64
full_m64 = _keepalive(model.build_full_detect_fn(detect_layer, 0.01, 0.5, corner_k=256, top_m=64, top_n=100))
timeit("full, top_m=64", full_m64, (model.params, model.state, x))
print("DONE")
