"""Numerical value/gradient tests for DC / CM / D / A / B
(VERDICT round-1 item 7): explicit-matrix deconv adjoint, crop-mirror
train/test semantics, dropout inverted scaling, activation goldens,
border padding layout."""
import jax
import jax.numpy as jnp
import numpy
import pytest

from denet_tpu.layers.activation import apply_activation
from denet_tpu.layers.base import Ctx, InitialLayer
from denet_tpu.layers.border import BorderLayer
from denet_tpu.layers.convolution import ConvLayer
from denet_tpu.layers.crop_mirror import CropMirrorLayer
from denet_tpu.layers.deconvolution import DeconvLayer
from denet_tpu.layers.dropout import DropoutLayer


def run(layer, params, state, x, train=False, rng=None):
    ctx = Ctx(train=train,
              rng=rng if rng is not None else jax.random.PRNGKey(0))
    y, _ = layer.apply(params, state, [jnp.asarray(x)], ctx)
    return numpy.asarray(y)


def linear_matrix(fn, in_shape, out_size):
    """Explicit matrix of a linear map by pushing basis vectors through."""
    n = int(numpy.prod(in_shape))
    mat = numpy.zeros((out_size, n), dtype=numpy.float64)
    for i in range(n):
        e = numpy.zeros((n,), dtype=numpy.float32)
        e[i] = 1.0
        mat[:, i] = fn(e.reshape(in_shape)).flatten()
    return mat


@pytest.mark.parametrize("stride", [(1, 1), (2, 2)])
def test_deconv_matrix_is_exact_transpose_of_half_conv(stride):
    """The deconv operator's matrix equals the TRANSPOSE of the matrix of
    the stride-s 'half' conv with the channel-swapped kernel — the operator
    whose input-gradient defines the reference deconv
    (denet/layer/deconvolution.py:63-65).  Exact, element-by-element."""
    numpy.random.seed(8)
    in_shape = (1, 2, 3, 3)
    layers = [InitialLayer(in_shape)]
    deconv = DeconvLayer(layers, filter_shape=(3, 2, 3, 3),
                         filter_stride=stride, use_bias=False,
                         border_mode="half", wb=0.4)
    p = deconv.init_params()

    d_mat = linear_matrix(lambda x: run(deconv, p, {}, x), in_shape,
                          int(numpy.prod(deconv.output_shape)))

    # conv maps a deconv-OUTPUT-sized tensor back to deconv-INPUT size; pad
    # the conv's declared output up to the deconv input when stride shrinks
    conv_in = deconv.output_shape
    conv = ConvLayer([InitialLayer(conv_in)], filter_shape=(2, 3, 3, 3),
                     filter_stride=stride, border_mode="half", wb=0.0)
    w_t = numpy.transpose(p["weight"], (1, 0, 2, 3))

    def conv_fn(z):
        out = run(conv, {"weight": w_t}, {}, z)
        full = numpy.zeros(in_shape, dtype=numpy.float32)
        full[:, :, :out.shape[2], :out.shape[3]] = out
        return full

    c_mat = linear_matrix(conv_fn, conv_in, int(numpy.prod(in_shape)))
    numpy.testing.assert_allclose(d_mat, c_mat.T, atol=1e-5)


def test_deconv_weight_gradient_finite_difference():
    numpy.random.seed(9)
    in_shape = (2, 2, 3, 3)
    layers = [InitialLayer(in_shape)]
    deconv = DeconvLayer(layers, filter_shape=(2, 2, 3, 3),
                         filter_stride=(2, 2), use_bias=True,
                         border_mode="half", wb=0.4)
    p = deconv.init_params()
    x = numpy.random.uniform(-1, 1, in_shape).astype(numpy.float32)
    t = numpy.random.uniform(-1, 1, deconv.output_shape).astype(numpy.float32)

    def loss(params):
        ctx = Ctx(train=True, rng=jax.random.PRNGKey(0))
        y, _ = deconv.apply(params, {}, [jnp.asarray(x)], ctx)
        return jnp.sum((y - t) ** 2)

    grads = jax.grad(loss)(p)
    eps = 1e-3
    for key, idx in [("weight", (1, 0, 2, 1)), ("weight", (0, 1, 0, 0)),
                     ("bias", (1,))]:
        dp = {k: numpy.array(v) for k, v in p.items()}
        dp[key][idx] += eps
        up = float(loss(dp))
        dp[key][idx] -= 2 * eps
        dn = float(loss(dp))
        fd = (up - dn) / (2 * eps)
        assert abs(fd - float(grads[key][idx])) < 1e-2 * max(1.0, abs(fd))


def test_crop_mirror_test_path_is_center_crop():
    in_shape = (2, 3, 8, 8)
    layer = CropMirrorLayer([InitialLayer(in_shape)], crop_size=(4, 6),
                            mirror_pr=0.5, flip_pr=0.5)
    x = numpy.random.RandomState(1).uniform(-1, 1, in_shape).astype(
        numpy.float32)
    y = run(layer, {}, {}, x, train=False)
    # center offsets: dx=(8-4)//2=2, dy=(8-6)//2=1; no mirror/flip at test
    numpy.testing.assert_array_equal(y, x[:, :, 2:6, 1:7])


def test_crop_mirror_train_is_deterministic_under_key_and_valid():
    in_shape = (4, 2, 6, 6)
    layer = CropMirrorLayer([InitialLayer(in_shape)], crop_size=(4, 4),
                            mirror_pr=0.5, flip_pr=0.5)
    x = numpy.random.RandomState(2).uniform(-1, 1, in_shape).astype(
        numpy.float32)

    y1 = run(layer, {}, {}, x, train=True, rng=jax.random.PRNGKey(3))
    y2 = run(layer, {}, {}, x, train=True, rng=jax.random.PRNGKey(3))
    numpy.testing.assert_array_equal(y1, y2)
    y3 = run(layer, {}, {}, x, train=True, rng=jax.random.PRNGKey(4))
    assert not numpy.array_equal(y1, y3)

    # every sample must be one of the enumerable crop x mirror x flip
    # variants of its input image
    for b in range(in_shape[0]):
        candidates = []
        for ox in range(3):
            for oy in range(3):
                crop = x[b, :, ox:ox + 4, oy:oy + 4]
                for fx in (1, -1):
                    for fy in (1, -1):
                        candidates.append(crop[:, ::fx, ::fy])
        assert any(numpy.array_equal(y1[b], c) for c in candidates), b


def test_dropout_inverted_scaling_and_test_identity():
    in_shape = (1, 1, 64, 64)
    layer = DropoutLayer([InitialLayer(in_shape)], dropout_rate=0.25)
    x = numpy.full(in_shape, 2.0, dtype=numpy.float32)

    y = run(layer, {}, {}, x, train=True, rng=jax.random.PRNGKey(5))
    vals = numpy.unique(y)
    # kept units scaled by 1/keep = 1/0.75
    numpy.testing.assert_allclose(
        sorted(vals), [0.0, 2.0 / 0.75], atol=1e-6)
    keep_frac = (y != 0).mean()
    assert abs(keep_frac - 0.75) < 0.05
    # expectation preserved
    assert abs(y.mean() - 2.0) < 0.15

    numpy.testing.assert_array_equal(run(layer, {}, {}, x, train=False), x)
    zero = DropoutLayer([InitialLayer(in_shape)], dropout_rate=0.0)
    numpy.testing.assert_array_equal(
        run(zero, {}, {}, x, train=True, rng=jax.random.PRNGKey(5)), x)


def test_activation_goldens():
    x = numpy.array([[-2.0, -0.5, 0.0, 0.5, 2.0]], dtype=numpy.float32)
    xj = jnp.asarray(x)

    numpy.testing.assert_array_equal(
        numpy.asarray(apply_activation(xj, "none")), x)
    numpy.testing.assert_array_equal(
        numpy.asarray(apply_activation(xj, "relu")), numpy.maximum(x, 0))
    numpy.testing.assert_allclose(
        numpy.asarray(apply_activation(xj, "sigmoid")),
        1.0 / (1.0 + numpy.exp(-x)), atol=1e-6)
    numpy.testing.assert_allclose(
        numpy.asarray(apply_activation(xj, "tanh")), numpy.tanh(x), atol=1e-6)
    numpy.testing.assert_allclose(
        numpy.asarray(apply_activation(xj, "elu")),
        numpy.where(x > 0, x, numpy.exp(x) - 1), atol=1e-6)
    numpy.testing.assert_allclose(
        numpy.asarray(apply_activation(xj, "softplus")),
        numpy.log1p(numpy.exp(x)), atol=1e-6)
    sm = numpy.asarray(apply_activation(xj, "softmax"))   # softmax on axis 1
    ref = numpy.exp(x) / numpy.exp(x).sum(axis=1, keepdims=True)
    numpy.testing.assert_allclose(sm, ref, atol=1e-6)


def test_border_padding_layout():
    """border = (Left, Right, Top, Bottom): left/right pad the LAST axis,
    top/bottom the second-to-last (reference denet/layer/border.py)."""
    in_shape = (1, 1, 2, 3)
    layer = BorderLayer([InitialLayer(in_shape)], border=(1, 2, 3, 4))
    assert layer.output_shape == (1, 1, 2 + 3 + 4, 3 + 1 + 2)
    x = numpy.arange(6, dtype=numpy.float32).reshape(in_shape) + 1
    y = run(layer, {}, {}, x)
    assert y.shape == layer.output_shape
    # original block lands at [top:top+2, left:left+3]
    numpy.testing.assert_array_equal(y[0, 0, 3:5, 1:4], x[0, 0])
    total = y.sum()
    numpy.testing.assert_allclose(total, x.sum())
    assert (y[0, 0, :3] == 0).all() and (y[0, 0, 5:] == 0).all()
    assert (y[0, 0, :, 0] == 0).all() and (y[0, 0, :, 4:] == 0).all()
