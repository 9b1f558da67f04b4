"""int8 PTQ serving mode (denet_tpu/serve/quant.py).

Verifies region planning on the flagship structure, quantized-trunk
numerical agreement with the f32 forward, and the fused quantized
detection pipeline end-to-end on a toy detector.
"""
import numpy
import pytest

import jax
import jax.numpy as jnp

from denet_tpu.core.model import Ctx, Model
from denet_tpu.serve import quant


def _build_trunk(size=64):
    numpy.random.seed(11)
    model = Model()
    model.batch_size = 2
    model.class_num = 4
    model.class_labels = {str(i): i for i in range(4)}
    model.build(["C.B[8,7,2]", "BN", "A", "P[3,2,1]", "nRSN.O[2,8,3]",
                 "nRSN.O[2,16,3,2]"], (3, size, size),
                border_mode="half", weight_init=["he-forward"])
    return model


def _realistic_bn(model, data_u8, end=None):
    """Perturb gamma/beta (exercises the fold) and set running stats from
    the data (update_bn semantics over layers [1, end], iterated because
    the fixed point settles front-to-back one BN per pass).  Random stats
    would make activations amplify ~6x per block — a regime no int8 scheme
    (or trained model) lives in."""
    rng = numpy.random.RandomState(3)

    def visit(params):
        for p in params:
            if not p:
                continue
            if "gamma" in p:
                p["gamma"] = rng.uniform(0.8, 1.2, p["gamma"].shape).astype(
                    numpy.float32)
                p["bias"] = rng.normal(0, 0.1, p["bias"].shape).astype(
                    numpy.float32)
            if "layers" in p:
                visit(p["layers"])
    visit(model.params)

    if end is None:
        end = len(model.layers) - 1
    bn = []   # (layer, state_ref) within [1, end] incl. nested sublayers

    def walk(layer, state):
        if layer.type_name in ("batchnorm", "batchnorm-relu") and \
                layer.enabled:
            bn.append((layer, state))
        for i, sub in enumerate(layer.sublayers):
            walk(sub, state["layers"][i])
    for i in range(1, end + 1):
        walk(model.layers[i], model.state[i])
    ids = [id(layer) for layer, _ in bn]

    def stats_fn(params, state, x):
        ctx = Ctx(train=False, bn_stats={})
        outputs = {0: model.prep_input(x, ctx)}
        for i in range(1, end + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        return [ctx.bn_stats[i] for i in ids]

    fn = jax.jit(stats_fn)
    for _ in range(len(bn) + 2):
        stats = fn(model.params, model.state, jnp.asarray(data_u8))
        for (layer, st), (mean, var) in zip(bn, stats):
            st["mean"] = numpy.asarray(mean, numpy.float32)
            st["stdinv"] = (1.0 / numpy.sqrt(
                numpy.asarray(var, numpy.float64) + 1e-5)).astype(
                    numpy.float32)


def test_plan_region_flagship_structure():
    import __graft_entry__ as g
    model = g._build_detect_model(2, 128, class_num=8, variant="skip")
    ops, end, taps = quant.plan_region(model)
    assert end == 22                      # last resnet block
    assert taps == [12, 19]               # the two skip-src intermediates
    kinds = [o["kind"] for o in ops]
    assert kinds.count("block") == 16 and kinds.count("conv") == 1
    assert kinds.count("pool") == 1 and kinds.count("tap") == 2


@pytest.mark.parametrize("start", ["stem", "auto"])
def test_quant_trunk_matches_f32_forward(start):
    """start='stem': whole region incl. the uint8 input conv is int8;
    start='auto' (production default): bf16 stem + pool, int8 blocks."""
    model = _build_trunk()
    rng = numpy.random.RandomState(0)
    calib = [rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)
             for _ in range(2)]
    _realistic_bn(model, numpy.concatenate(calib))
    plan, qparams = quant.quantize(model, calib, start=start)

    x = rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)
    ctx = Ctx(train=False, compute_dtype=jnp.float32)
    outputs = {0: model.prep_input(jnp.asarray(x), ctx)}
    for i in range(1, plan["end"] + 1):
        y, _ = model.layers[i].apply(model.params[i], model.state[i],
                                     outputs, ctx)
        outputs[i] = y

    if start == "stem":
        assert plan["start"] == 1 and plan["in_scale"] is None
        got = quant.apply_trunk(plan, qparams, jnp.asarray(x), jnp.float32)
    else:
        assert plan["start"] == 5 and plan["in_scale"] > 0  # first block
        got = quant.apply_trunk(plan, qparams, outputs[plan["start"] - 1],
                                jnp.float32)

    ref = numpy.asarray(outputs[plan["end"]])
    q = numpy.asarray(got[plan["end"]])
    assert q.shape == ref.shape
    # int8 activations through the region: tight correlation, small NRMSE
    denom = max(1e-6, float(numpy.abs(ref).max()))
    nrmse = float(numpy.sqrt(numpy.mean((q - ref) ** 2))) / denom
    corr = float(numpy.corrcoef(q.ravel(), ref.ravel())[0, 1])
    assert nrmse < 0.06, nrmse
    assert corr > 0.99, corr
    # quantized codes actually used a wide range (not saturated/collapsed)
    assert int(numpy.count_nonzero(q)) > q.size // 4


def test_quant_detect_fn_toy_detector():
    """Fused quantized detection pipeline returns well-formed detections
    on a toy detector with a quantizable (stem + resnet) trunk."""
    model = _toy_quant_detector()
    rng = numpy.random.RandomState(5)
    calib = [rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)]
    _realistic_bn(model, calib[0], end=quant.plan_region(model)[1])
    plan, qparams = quant.quantize(model, calib)
    assert plan["end"] == 6               # two resnet blocks
    detect_layer = model.layers[-1]
    fn = quant.build_quant_detect_fn(model, detect_layer, plan,
                                     pr_threshold=0.001, nms_threshold=0.5,
                                     corner_k=64, top_m=32, top_n=16)
    dets, counts = fn(qparams, model.params, model.state,
                      jnp.asarray(rng.randint(0, 256, (2, 3, 64, 64))
                                  .astype(numpy.uint8)))
    dets = numpy.asarray(dets)
    counts = numpy.asarray(counts)
    assert dets.shape[0] == 2 and dets.shape[2] == 6
    assert (counts >= 0).all() and (counts <= dets.shape[1]).all()


def _toy_quant_detector():
    import random

    random.seed(21)
    numpy.random.seed(21)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    model.build(["C.B[8,7,2]", "BN", "A", "P[3,2,1]", "nRSN.O[2,8,3]",
                 "DNC[16]", "DNS[2,4,0.01,0.1]", "C[16,1]", "BN", "A",
                 "DND[0.5,1.0,0.0,0.0]"], (3, 64, 64),
                border_mode="half", weight_init=["he-forward"])
    return model


def test_get_detections_use_int8_param():
    """useInt8=1 routes the fused device path through the PTQ pipeline
    (self-calibrated on the first batch) and returns well-formed results."""
    model = _toy_quant_detector()
    rng = numpy.random.RandomState(5)
    x = rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)
    _realistic_bn(model, x, end=quant.plan_region(model)[1])
    metas = [{"bbox": [], "class": []} for _ in range(2)]
    detect_layer = model.layers[-1]
    res = detect_layer.get_detections(
        model, x, metas, {"prThreshold": 0.001, "nmsThreshold": 0.5,
                          "useInt8": 1})
    assert len(res) == 2
    for r in res:
        for pr, cls, bb in r["detections"]:
            assert 0.0 <= pr <= 1.0
            assert 0 <= cls < model.class_num


def test_full_detect_fn_forwards_soft_nms(monkeypatch):
    """Regression: build_full_detect_fn accepted use_soft_nms but silently
    dropped it before the device NMS call."""
    import denet_tpu.ops.nms_device as nd

    seen = {}
    orig = nd.nms

    def spy(*a, **k):
        seen["soft"] = k.get("use_soft_nms")
        return orig(*a, **k)

    monkeypatch.setattr(nd, "nms", spy)
    model = _toy_quant_detector()
    fn = model.build_full_detect_fn(model.layers[-1], 0.01, 0.5,
                                    corner_k=64, top_m=32, top_n=16,
                                    use_soft_nms=True)
    rng = numpy.random.RandomState(1)
    fn(model.params, model.state,
       jnp.asarray(rng.randint(0, 256, (2, 3, 64, 64))
                   .astype(numpy.uint8)))
    assert seen["soft"] is True


def test_quant_trunk_bottleneck_blocks():
    """ResNet-101-style bottleneck blocks (3 convs + projection) quantize
    through the same generic stage walk."""
    numpy.random.seed(13)
    model = Model()
    model.batch_size = 2
    model.class_num = 4
    model.class_labels = {str(i): i for i in range(4)}
    model.build(["C.B[8,7,2]", "BN", "A", "P[3,2,1]", "nRSN.O[2,16,3,1,8]",
                 "nRSN.O[2,32,3,2,16]"], (3, 64, 64),
                border_mode="half", weight_init=["he-forward"])
    rng = numpy.random.RandomState(2)
    calib = [rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)
             for _ in range(2)]
    _realistic_bn(model, numpy.concatenate(calib))
    plan, qparams = quant.quantize(model, calib)
    blocks = [o for o in plan["ops"] if o["kind"] == "block"]
    assert len(blocks) == 4
    assert all(len(b["stages"]) == 3 for b in blocks)   # bottleneck = 3 convs

    x = rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)
    ctx = Ctx(train=False, compute_dtype=jnp.float32)
    outputs = {0: model.prep_input(jnp.asarray(x), ctx)}
    for i in range(1, plan["end"] + 1):
        y, _ = model.layers[i].apply(model.params[i], model.state[i],
                                     outputs, ctx)
        outputs[i] = y
    got = quant.apply_trunk(plan, qparams, outputs[plan["start"] - 1],
                            jnp.float32)
    ref = numpy.asarray(outputs[plan["end"]])
    q = numpy.asarray(got[plan["end"]])
    denom = max(1e-6, float(numpy.abs(ref).max()))
    nrmse = float(numpy.sqrt(numpy.mean((q - ref) ** 2))) / denom
    assert nrmse < 0.08, nrmse
    assert float(numpy.corrcoef(q.ravel(), ref.ravel())[0, 1]) > 0.98


def test_use_int8_rejected_on_unsupported_paths():
    """useInt8=1 must raise (not silently fall back to bf16) on the
    clustered/host paths and the batched API."""
    model = _toy_quant_detector()
    detect_layer = model.layers[-1]
    x = numpy.zeros((2, 3, 64, 64), numpy.uint8)
    metas = [{"bbox": [], "class": []}] * 2

    with pytest.raises(ValueError):     # host fallback path
        detect_layer.get_detections(
            model, x, metas, {"useInt8": 1, "useDevicePipeline": 0})

    with pytest.raises(ValueError):     # batched API
        detect_layer.get_detections_batched(
            model, iter([(x, metas)]), {"useInt8": 1})

    # clustered (v2) model: nms_threshold < 1.0
    detect_layer.sparse_layer.nms_threshold = 0.7
    try:
        with pytest.raises(ValueError):
            detect_layer.get_detections(model, x, metas, {"useInt8": 1})
    finally:
        detect_layer.sparse_layer.nms_threshold = 1.0


def test_quant_detect_fn_soft_nms_smoke():
    """Quantized pipeline with gaussian Soft-NMS compiles and returns
    well-formed detections (the soft flag must reach the device NMS)."""
    model = _toy_quant_detector()
    rng = numpy.random.RandomState(9)
    calib = [rng.randint(0, 256, (2, 3, 64, 64)).astype(numpy.uint8)]
    _realistic_bn(model, calib[0], end=quant.plan_region(model)[1])
    plan, qparams = quant.quantize(model, calib)
    fn = quant.build_quant_detect_fn(model, model.layers[-1], plan,
                                     pr_threshold=0.001, nms_threshold=0.5,
                                     corner_k=64, top_m=32, top_n=16,
                                     use_soft_nms=True)
    dets, counts = fn(qparams, model.params, model.state,
                      jnp.asarray(rng.randint(0, 256, (2, 3, 64, 64))
                                  .astype(numpy.uint8)))
    dets = numpy.asarray(dets)
    assert dets.shape[0] == 2 and dets.shape[2] == 6
    counts = numpy.asarray(counts)
    assert (counts >= 0).all() and (counts <= dets.shape[1]).all()
