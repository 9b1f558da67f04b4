"""Layer type registry — scan order matches the reference
(denet/layer/layer_types.py:17-25) so desc parsing resolves identically.
"""
from denet_tpu.layers.activation import ActivationLayer
from denet_tpu.layers.base import IdentityLayer, InitialLayer  # noqa: F401
from denet_tpu.layers.batch_norm import BatchNormLayer, BatchNormReluLayer
from denet_tpu.layers.border import BorderLayer
from denet_tpu.layers.convolution import ConvLayer
from denet_tpu.layers.crop_mirror import CropMirrorLayer
from denet_tpu.layers.deconvolution import DeconvLayer
from denet_tpu.layers.dropout import DropoutLayer
from denet_tpu.layers.pool import PoolLayer
from denet_tpu.layers.pool_inv import PoolInvLayer
from denet_tpu.layers.regression import RegressionLayer
from denet_tpu.layers.resnet import ResnetLayer
from denet_tpu.layers.skip import SkipLayer, SkipSrcLayer
from denet_tpu.layers.split import SplitLayer

layer_types = [IdentityLayer, DropoutLayer, BorderLayer, ConvLayer, PoolLayer,
               PoolInvLayer, RegressionLayer, CropMirrorLayer, ActivationLayer,
               BatchNormLayer, BatchNormReluLayer, ResnetLayer, DeconvLayer,
               SplitLayer, SkipLayer, SkipSrcLayer]

# DeNet detection layers
from denet_tpu.layers.denet_corner import DeNetCornerLayer    # noqa: E402
from denet_tpu.layers.denet_sparse import DeNetSparseLayer    # noqa: E402
from denet_tpu.layers.denet_detect import DeNetDetectLayer    # noqa: E402
layer_types += [DeNetCornerLayer, DeNetSparseLayer, DeNetDetectLayer]
