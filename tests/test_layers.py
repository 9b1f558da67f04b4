"""Layer-level unit tests: shapes, reference-exact formulas, round-trips."""
import math

import jax
import jax.numpy as jnp
import numpy
import pytest

from denet_tpu.core.model import Model
from denet_tpu.layers.base import Ctx, InitialLayer
from denet_tpu.layers.batch_norm import BatchNormLayer
from denet_tpu.layers.convolution import ConvLayer
from denet_tpu.layers.pool import PoolLayer
from denet_tpu.layers.pool_inv import PoolInvLayer


def run_layer(layer, params, state, x, train=False, rng=None):
    ctx = Ctx(train=train, rng=rng if rng is not None else jax.random.PRNGKey(0))
    y, ns = layer.apply(params, state, [jnp.asarray(x)], ctx)
    return numpy.asarray(y), ns, ctx


def test_conv_valid_shape_and_value():
    numpy.random.seed(0)
    layers = [InitialLayer((2, 3, 8, 8))]
    conv = ConvLayer(layers, filter_shape=(4, 3, 3, 3), filter_stride=(1, 1),
                     use_bias=True, border_mode="valid", wb="he-forward")
    p, s = conv.init_params(), conv.init_state()
    assert conv.output_shape == (2, 4, 6, 6)

    x = numpy.random.uniform(-1, 1, (2, 3, 8, 8)).astype(numpy.float32)
    y, _, _ = run_layer(conv, p, s, x)
    assert y.shape == (2, 4, 6, 6)

    # check against explicit true-convolution (flipped kernel correlation)
    w = p["weight"]
    ref = numpy.zeros((2, 4, 6, 6), dtype=numpy.float32)
    wf = w[:, :, ::-1, ::-1]
    for b in range(2):
        for o in range(4):
            for i in range(6):
                for j in range(6):
                    ref[b, o, i, j] = numpy.sum(
                        x[b, :, i:i + 3, j:j + 3] * wf[o]) + p["bias"][o]
    assert numpy.allclose(y, ref, atol=1e-4)


@pytest.mark.parametrize("border_mode,stride", [
    ("valid", (1, 1)), ("valid", (2, 2)), ("full", (1, 1)), ("half", (1, 1)),
    ("half", (2, 2)), ("same", (1, 1)), (1, (1, 1)), (2, (2, 2))])
def test_conv_border_modes_shape(border_mode, stride):
    layers = [InitialLayer((1, 2, 9, 9))]
    conv = ConvLayer(layers, filter_shape=(3, 2, 3, 3), filter_stride=stride,
                     border_mode=border_mode, wb=0.1)
    x = numpy.random.uniform(-1, 1, (1, 2, 9, 9)).astype(numpy.float32)
    y, _, _ = run_layer(conv, conv.init_params(), conv.init_state(), x)
    assert y.shape == conv.output_shape


def test_conv_init_bounds():
    numpy.random.seed(3)
    layers = [InitialLayer((1, 8, 4, 4))]
    conv = ConvLayer(layers, filter_shape=(16, 8, 3, 3), wb="he-forward")
    assert abs(conv.w_bound - math.sqrt(2.0 / (3 * 3 * 8))) < 1e-9
    conv = ConvLayer(layers, filter_shape=(16, 8, 3, 3), wb="he-backward")
    assert abs(conv.w_bound - math.sqrt(2.0 / (3 * 3 * 16))) < 1e-9
    conv = ConvLayer(layers, filter_shape=(16, 8, 3, 3), wb="uniform,xavier-forward")
    assert abs(conv.w_bound - math.sqrt(1.0 / (3 * 3 * 8))) < 1e-9
    assert numpy.abs(conv.init_params()["weight"]).max() <= conv.w_bound


def test_pool_max_and_avg():
    layers = [InitialLayer((1, 1, 4, 4))]
    pool = PoolLayer(layers, size=(2, 2))
    x = numpy.arange(16, dtype=numpy.float32).reshape(1, 1, 4, 4)
    y, _, _ = run_layer(pool, {}, {}, x)
    assert y.shape == (1, 1, 2, 2)
    assert numpy.allclose(y[0, 0], [[5, 7], [13, 15]])

    pool = PoolLayer(layers, size=(2, 2), mode="average_inc_pad")
    y, _, _ = run_layer(pool, {}, {}, x)
    assert numpy.allclose(y[0, 0], [[2.5, 4.5], [10.5, 12.5]])


def test_pool_ignore_border_false():
    layers = [InitialLayer((1, 1, 5, 5))]
    pool = PoolLayer(layers, size=(2, 2), ignore_border=False)
    assert pool.output_shape == (1, 1, 3, 3)
    x = numpy.arange(25, dtype=numpy.float32).reshape(1, 1, 5, 5)
    y, _, _ = run_layer(pool, {}, {}, x)
    assert y[0, 0, 2, 2] == 24.0


def test_pool_inv():
    layers = [InitialLayer((1, 2, 2, 2))]
    pi = PoolInvLayer(layers, size=(2, 2))
    x = numpy.arange(8, dtype=numpy.float32).reshape(1, 2, 2, 2)
    y, _, _ = run_layer(pi, {}, {}, x)
    assert y.shape == (1, 2, 4, 4)
    assert numpy.allclose(y[0, 0, :2, :2], x[0, 0, 0, 0])


def test_pool_inv_combined_lowering_matches_repeat(monkeypatch):
    """DENET_TPU_POOLINV=combined (single broadcast+reshape, round-5 HLO
    A/B arm) must be element-for-element identical to the repeat default,
    including asymmetric scale factors."""
    x = numpy.random.RandomState(7).uniform(
        -1, 1, (2, 3, 4, 5)).astype(numpy.float32)
    outs = {}
    for arm in ("repeat", "combined"):
        monkeypatch.setenv("DENET_TPU_POOLINV", arm)
        layers = [InitialLayer(x.shape)]
        pi = PoolInvLayer(layers, size=(3, 2))   # (sx, sy) asymmetric
        y, _, _ = run_layer(pi, {}, {}, x)
        outs[arm] = numpy.asarray(y)
    assert outs["repeat"].shape == outs["combined"].shape
    numpy.testing.assert_array_equal(outs["repeat"], outs["combined"])


def test_batch_norm_train_stats():
    """Mirrors the reference self-test (batch_norm.py:131-158): normalized
    output has ~zero mean / unit std and the EMAs move toward batch stats."""
    numpy.random.seed(1002)
    eps = 1e-3
    shape = (64, 32, 8, 8)
    layers = [InitialLayer(shape)]
    bn = BatchNormLayer(layers)
    p, s = bn.init_params(), bn.init_state()
    x = numpy.random.uniform(0.0, 1.0, shape).astype(numpy.float32)
    y, ns, _ = run_layer(bn, p, s, x, train=True)
    assert abs(float(y.mean())) < eps
    assert abs(float(y.std()) - 1.0) < eps
    # EMA: 0.9*0 + 0.1*batch_mean
    assert abs(float(numpy.asarray(ns["mean"]).mean()) - x.mean() * 0.1) < eps


def test_batch_norm_eval_uses_ema():
    shape = (4, 3, 4, 4)
    layers = [InitialLayer(shape)]
    bn = BatchNormLayer(layers)
    p, s = bn.init_params(), bn.init_state()
    s = {"mean": numpy.full((3,), 2.0, dtype=numpy.float32),
         "stdinv": numpy.full((3,), 0.5, dtype=numpy.float32)}
    x = numpy.full(shape, 2.0, dtype=numpy.float32)
    y, _, _ = run_layer(bn, p, s, x, train=False)
    assert numpy.allclose(y, 0.0, atol=1e-5)


def test_simple_model_build_and_forward():
    model = Model()
    model.batch_size = 4
    model.class_num = 10
    model.class_labels = {str(i): i for i in range(10)}
    model.build(["C[16,3]", "BN", "A", "P[2]", "C[32,3]", "BN", "A", "P[2]", "R"],
                (3, 32, 32), activation="relu", border_mode="valid",
                weight_init=["he-forward"])
    x = numpy.random.uniform(0, 1, (4, 3, 32, 32)).astype(numpy.float32)
    ctx = Ctx(train=False)
    outputs, _ = model.forward(model.params, model.state, jnp.asarray(x), ctx)
    out = numpy.asarray(outputs[len(model.layers) - 1])
    assert out.shape == (4, 10)
    assert numpy.allclose(out.sum(axis=1), 1.0, atol=1e-4)


def test_resnet_block_shapes():
    model = Model()
    model.batch_size = 2
    model.class_num = 10
    model.class_labels = {}
    model.build(["C[16,3]", "nRSN[2,32,3,2]", "R"], (3, 16, 16),
                border_mode="half", weight_init=["he-forward"])
    x = numpy.random.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    ctx = Ctx(train=True, rng=jax.random.PRNGKey(0))
    outputs, new_state = model.forward(model.params, model.state,
                                       jnp.asarray(x), ctx)
    out = numpy.asarray(outputs[len(model.layers) - 1])
    assert out.shape == (2, 10)


def test_conv_same_even_kernel_matches_full_crop():
    """'same' mode == full conv cropped from (k-1)//2 (reference
    convolution.py:76-80), checked for an EVEN kernel where the asymmetric
    padding matters."""
    numpy.random.seed(5)
    layers = [InitialLayer((1, 2, 6, 6))]
    conv_same = ConvLayer(layers, filter_shape=(3, 2, 4, 4),
                          border_mode="same", wb=0.2)
    p = conv_same.init_params()
    x = numpy.random.uniform(-1, 1, (1, 2, 6, 6)).astype(numpy.float32)
    y_same, _, _ = run_layer(conv_same, p, {}, x)
    assert y_same.shape == (1, 3, 6, 6)

    conv_full = ConvLayer(layers, filter_shape=(3, 2, 4, 4),
                          border_mode="full", wb=0.2)
    y_full, _, _ = run_layer(conv_full, p, {}, x)
    y0 = (4 - 1) // 2
    ref = y_full[:, :, y0:y0 + 6, y0:y0 + 6]
    assert numpy.allclose(y_same, ref, atol=1e-5)


def test_deconv_is_adjoint_of_half_conv():
    """<deconv(x), z> == <x, conv(z)> where conv is the stride-s 'half'
    true-convolution with the channel-swapped kernel (the operator whose
    input-gradient defines the reference deconv, deconvolution.py:63-65)."""
    import jax
    from denet_tpu.layers.deconvolution import DeconvLayer

    numpy.random.seed(6)
    for stride in [(1, 1), (2, 2)]:
        in_shape = (1, 3, 5, 5)
        layers = [InitialLayer(in_shape)]
        deconv = DeconvLayer(layers, filter_shape=(4, 3, 3, 3),
                             filter_stride=stride, use_bias=False,
                             border_mode="half", wb=0.3)
        p = deconv.init_params()
        x = numpy.random.uniform(-1, 1, in_shape).astype(numpy.float32)
        y, _, _ = run_layer(deconv, p, {}, x)
        assert y.shape == deconv.output_shape

        # forward conv: z (deconv-output space) -> x space
        conv_layers = [InitialLayer(deconv.output_shape)]
        conv = ConvLayer(conv_layers, filter_shape=(3, 4, 3, 3),
                         filter_stride=stride, border_mode="half", wb=0.0)
        w_T = numpy.transpose(p["weight"], (1, 0, 2, 3))
        z = numpy.random.uniform(-1, 1, deconv.output_shape).astype(numpy.float32)
        cz, _, _ = run_layer(conv, {"weight": w_T}, {}, z)
        # conv output may be 1 smaller than x for stride 2 — crop both sides
        h, w = cz.shape[2], cz.shape[3]
        lhs = float(numpy.sum(y * z))
        rhs = float(numpy.sum(x[:, :, :h, :w] * cz))
        assert abs(lhs - rhs) < 1e-2 * max(1.0, abs(lhs))


def test_bna_matches_bn_relu_forward_and_grad():
    """BNA must equal relu(BN(x)) in value AND gradient (the reference's
    fused-op self-test, batch_norm_relu.py:171-212: grad masks dy by
    bn_out>0 then runs the BN gradient — exactly autodiff of the
    composition)."""
    import jax
    from denet_tpu.core.model import Model

    def build(desc):
        numpy.random.seed(13)
        m = Model()
        m.batch_size = 2
        m.class_num = 2
        m.class_labels = {"a": 0, "b": 1}
        m.build(desc, (3, 8, 8), border_mode="half",
                weight_init=["he-forward"])
        return m

    # identical seeds and identical random-draw order (BN/BNA draw nothing)
    # give both models the same conv weights
    m1 = build(["C[4,3]", "BN", "A", "R"])
    m2 = build(["C[4,3]", "BNA", "R"])

    x = numpy.random.RandomState(3).uniform(
        0, 1, (2, 3, 8, 8)).astype(numpy.float32)
    yt = numpy.array([0, 1], dtype=numpy.int64)

    def loss(model, params):
        ctx = Ctx(train=True, rng=jax.random.PRNGKey(0))
        total, _aux = model.loss(params, model.state, x,
                                 [yt, numpy.ones(2, numpy.float32)], ctx)
        return total

    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(m1.params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m2, p))(m2.params)
    assert numpy.allclose(float(l1), float(l2), atol=1e-6)
    # conv + BN gradients identical between the composed and fused forms
    for k in ("weight",):
        assert numpy.allclose(numpy.asarray(g1[1][k]),
                              numpy.asarray(g2[1][k]), atol=1e-6)
    for k in ("gamma", "bias"):
        assert numpy.allclose(numpy.asarray(g1[2][k]),
                              numpy.asarray(g2[2][k]), atol=1e-6)


def test_s2d_stem_matches_direct_conv(monkeypatch):
    """DENET_TPU_S2D_STEM=1 rewrites the 7x7/s2 'half' stem conv into
    space-to-depth block space — identical math (f32: exact to accumulation
    order), including gradients through the original OIHW weights."""
    import jax
    from denet_tpu.layers.base import Ctx

    numpy.random.seed(17)
    layers = [InitialLayer((2, 3, 32, 32))]
    conv = ConvLayer(layers, (64, 3, 7, 7), (2, 2), True, "half", "he-forward")
    params = conv.init_params()
    x = numpy.random.RandomState(1).uniform(
        0, 1, (2, 3, 32, 32)).astype(numpy.float32)

    def run():
        def f(p, xx):
            ctx = Ctx(train=False)
            y, _ = conv.apply(p, {}, {0: jnp.asarray(xx)}, ctx)
            return y
        y, vjp = jax.vjp(lambda p: f(p, x), params)
        g, = vjp(jnp.ones_like(y))
        return numpy.asarray(y), numpy.asarray(g["weight"])

    monkeypatch.setenv("DENET_TPU_S2D_STEM", "0")
    y0, g0 = run()
    monkeypatch.setenv("DENET_TPU_S2D_STEM", "1")
    y1, g1 = run()
    assert y0.shape == y1.shape == (2, 64, 16, 16)
    assert numpy.allclose(y0, y1, atol=1e-5)
    assert numpy.allclose(g0, g1, atol=1e-4)


def test_s2d_stem_uint8_deferred_decode_bitwise(monkeypatch):
    """uint8 inputs pass through Model.prep_input undecoded when the first
    layer is the S2D-eligible stem; the conv decodes after its 1-byte
    transpose.  Bitwise-identical to decode-then-transpose (u8->float is
    exact, decode is elementwise)."""
    from denet_tpu.core.model import Model
    from denet_tpu.layers.base import Ctx

    monkeypatch.setenv("DENET_TPU_S2D_STEM", "1")
    numpy.random.seed(23)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    model.build(["C[16,7,2]", "BN", "A", "R"], (3, 32, 32),
                border_mode="half", weight_init=["he-forward"])

    x_u8 = numpy.random.RandomState(2).randint(
        0, 256, (2, 3, 32, 32)).astype(numpy.uint8)
    x_f32 = x_u8.astype(numpy.float32) / 255.0

    ctx = Ctx(train=False)
    # deferred-decode path: prep_input must leave uint8 untouched
    assert model.prep_input(jnp.asarray(x_u8), ctx).dtype == jnp.uint8
    out_u8, _ = model.forward(model.params, model.state,
                              jnp.asarray(x_u8), Ctx(train=False))
    out_f32, _ = model.forward(model.params, model.state,
                               jnp.asarray(x_f32), Ctx(train=False))
    last = len(model.layers) - 1
    assert numpy.array_equal(numpy.asarray(out_u8[last]),
                             numpy.asarray(out_f32[last]))

    # non-eligible first layer (plain 3x3 conv): prep decodes as before
    model2 = Model()
    model2.batch_size = 2
    model2.class_num = 3
    model2.class_labels = model.class_labels
    model2.build(["C[8,3]", "R"], (3, 32, 32), border_mode="half",
                 weight_init=["he-forward"])
    decoded = model2.prep_input(jnp.asarray(x_u8), Ctx(train=False))
    assert decoded.dtype == jnp.float32


def test_inference_params_precast_is_bitwise_identical():
    """Model.inference_params casts only conv/deconv "weight" leaves to the
    compute dtype; forward outputs are bitwise-identical (the conv sees the
    same bf16 operand either way) and BN leaves stay f32."""
    from denet_tpu.core.model import Model
    from denet_tpu.layers.base import Ctx

    numpy.random.seed(31)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    model.build(["C.B[8,3]", "BN", "A", "DC[4,3,2]", "R"], (3, 16, 16),
                border_mode="half", weight_init=["he-forward"])
    model.compute_dtype = jnp.bfloat16

    x = numpy.random.RandomState(3).uniform(
        0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    ctx = lambda: Ctx(train=False, compute_dtype=model.compute_dtype)  # noqa: E731
    out0, _ = model.forward(model.params, model.state, jnp.asarray(x), ctx())
    pi = model.inference_params()
    out1, _ = model.forward(pi, model.state, jnp.asarray(x), ctx())
    last = len(model.layers) - 1
    assert numpy.array_equal(numpy.asarray(out0[last]),
                             numpy.asarray(out1[last]))
    # conv + deconv weights cast, BN gamma untouched, biases untouched
    assert pi[1]["weight"].dtype == jnp.bfloat16
    assert pi[4]["weight"].dtype == jnp.bfloat16
    assert pi[1]["bias"].dtype == jnp.float32
    assert pi[2]["gamma"].dtype == jnp.float32
    # cache hit on unchanged params; rebuilt when params object changes
    assert model.inference_params() is pi
    model.params = list(model.params)
    assert model.inference_params() is not pi
    # in-place leaf mutation keeps the identity -> invalidate_cached_params
    # must drop the stale cast copy (ADVICE round 2: silent stale weights)
    pi2 = model.inference_params()
    model.params[1]["weight"] = numpy.zeros_like(
        numpy.asarray(model.params[1]["weight"]))
    model.invalidate_cached_params()
    pi3 = model.inference_params()
    assert pi3 is not pi2
    assert not numpy.asarray(pi3[1]["weight"]).any()
    # no compute dtype -> passthrough
    model.compute_dtype = None
    assert model.inference_params() is model.params


def test_import_json_invalidates_inference_cache():
    """Re-importing a checkpoint into an existing Model must drop the cached
    cast param tree and the cached predict fn (ADVICE round 2 hardening:
    invalidate at the import boundary, not just at caller mutation sites)."""
    from denet_tpu.core.model import Model

    numpy.random.seed(32)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    model.build(["C.B[8,3]", "BN", "A", "R"], (3, 16, 16),
                border_mode="half", weight_init=["he-forward"])
    model.compute_dtype = jnp.bfloat16
    pi = model.inference_params()
    model._predict_fn = object()  # sentinel: any cached jit must be dropped

    json_obj = model.export_json()
    for row in json_obj["layers"]:
        if row["type"] == "conv":
            row["weight"] = numpy.zeros_like(numpy.asarray(row["weight"]))
    model.import_json(json_obj)

    assert model._predict_fn is None
    pi2 = model.inference_params()
    assert pi2 is not pi
    assert not numpy.asarray(pi2[1]["weight"]).any()
