"""Detection stack tests: sparse gather parity, native corner search / NMS,
and end-to-end detection training + inference on synthetic data.

Mirrors the reference's inline self-tests (denet_sparse.py:222-285,
SURVEY.md §4) with a numpy loop-reference instead of the CUDA-vs-Theano pair.
"""
import math
import random

import jax
import jax.numpy as jnp
import numpy
import pytest

from denet_tpu.core.model import Model
from denet_tpu.ops import native
from denet_tpu.ops.sparse_gather import sparse_gather
from denet_tpu.train.trainer import Trainer


def naive_sparse_gather(feat, bbox, gs):
    """Loop reference implementing the documented semantics."""
    b, f, h, w = feat.shape
    _, sn, _, _ = bbox.shape
    out = numpy.zeros((b, f * gs * gs + 2, sn, sn), dtype=numpy.float32)
    for bi in range(b):
        for j in range(sn):
            for i in range(sn):
                x0, y0, x1, y1 = bbox[bi, j, i]
                bw, bh = x1 - x0, y1 - y0
                for gy in range(gs):
                    for gx in range(gs):
                        sx = x0 + gx * bw / (gs - 1) if gs > 1 else x0
                        sy = y0 + gy * bh / (gs - 1) if gs > 1 else y0
                        xi = int(math.floor(min(max(sx * w, 0), w - 1) + 0.5))
                        yi = int(math.floor(min(max(sy * h, 0), h - 1) + 0.5))
                        g = gy * gs + gx
                        out[bi, g * f:(g + 1) * f, j, i] = feat[bi, :, yi, xi]
                out[bi, f * gs * gs, j, i] = bh
                out[bi, f * gs * gs + 1, j, i] = bw
    return out


@pytest.mark.parametrize("gs", [1, 3, 7])
def test_sparse_gather_matches_naive(gs):
    rng = numpy.random.RandomState(1)
    b, f, h, w, sn = 2, 5, 8, 8, 3
    feat = rng.uniform(-5, 5, (b, f, h, w)).astype(numpy.float32)
    bbox = numpy.zeros((b, sn, sn, 4), dtype=numpy.float32)
    for bi in range(b):
        for j in range(sn):
            for i in range(sn):
                x0, y0 = rng.uniform(0, 1, 2)
                bbox[bi, j, i] = [x0, y0, rng.uniform(x0, 1), rng.uniform(y0, 1)]

    out = numpy.asarray(sparse_gather(jnp.asarray(feat), jnp.asarray(bbox), gs))
    ref = naive_sparse_gather(feat, bbox, gs)
    assert numpy.allclose(out, ref, atol=1e-5)

    # the "nchw" lowering (round-5 gather A/B arm) is bitwise-identical
    alt = numpy.asarray(sparse_gather(jnp.asarray(feat), jnp.asarray(bbox),
                                      gs, impl="nchw"))
    assert numpy.array_equal(out, alt)


def test_sparse_gather_grad_is_scatter_add():
    """Sum-of-output gradient w.r.t. features counts how many grid points hit
    each feature cell (scatter-add transpose)."""
    b, f, h, w, sn, gs = 1, 2, 4, 4, 2, 2
    feat = jnp.ones((b, f, h, w), dtype=jnp.float32)
    bbox = jnp.tile(jnp.asarray([0.0, 0.0, 1.0, 1.0]), (b, sn, sn, 1))
    g = jax.grad(lambda ft: jnp.sum(sparse_gather(ft, bbox, gs)))(feat)
    g = numpy.asarray(g)
    # every sample hits the 4 image corners: (0,0),(0,3),(3,0),(3,3) each
    # sn*sn = 4 times per feature channel
    assert g[0, 0, 0, 0] == sn * sn
    assert g[0, 0, 3, 3] == sn * sn
    assert g[0, 0, 1, 1] == 0


def make_corner_pr(batch, corner_num, h, w, true_corners, hot=-0.2027):
    """Build a log-prob corner heatmap with given 'hot' corners.

    true_corners: list per image of (ci, x, y).  The default hot logit gives
    corner pr ~0.6 — note the sample score 1/(1+exp(|sum_f - sum_t|))
    (reference denet_sparse.cc:306) peaks for *balanced* corner evidence, so
    ultra-confident corners would score ~0."""
    lh = numpy.full((batch, corner_num, h, w), 5.0, dtype=numpy.float32)
    for b, corners in enumerate(true_corners):
        for (ci, x, y) in corners:
            lh[b, ci, y, x] = hot
    # [not-corner, corner] two-way log softmax of [lh, -lh]
    stack = numpy.stack([lh, -lh], axis=1)
    m = stack.max(axis=1, keepdims=True)
    log_pr = stack - m - numpy.log(
        numpy.sum(numpy.exp(stack - m), axis=1, keepdims=True))
    return log_pr.astype(numpy.float32)


def test_build_samples_finds_bbox():
    h = w = 8
    # one object with corners at (1,1) and (5,6): TL(1,1) BR(5,6)
    corner_pr = make_corner_pr(1, 4, h, w,
                               [[(0, 1, 1), (1, 5, 1), (2, 1, 6), (3, 5, 6)]])
    samples = native.build_samples(1, corner_pr, 0.3, 4, 1024, 0, 1.0)
    assert len(samples) == 1
    assert len(samples[0]) >= 1
    # best sample should be the true bbox (normalized, +1 exclusive edges)
    pr, bbox = samples[0][0]
    assert pr > 0.05
    expect = (1 / 8, 1 / 8, 6 / 8, 7 / 8)
    assert numpy.allclose(bbox, expect, atol=1e-6)


def test_build_samples_dedup_and_count_cap():
    h = w = 8
    corners = [[(ci, x, y) for ci in range(4) for x in range(0, 8, 2)
                for y in range(0, 8, 2)]]
    corner_pr = make_corner_pr(1, 4, h, w, corners)
    sample_num = 3
    samples = native.build_samples(1, corner_pr, 0.3, sample_num, 1024, 0, 1.0)
    assert len(samples[0]) <= sample_num * sample_num
    bboxes = [s[1] for s in samples[0]]
    assert len(set(bboxes)) == len(bboxes)  # dedup


def test_build_samples_clustering_runs():
    h = w = 16
    corners = [[(ci, x, y) for ci in range(4) for x in range(0, 16, 2)
                for y in range(0, 16, 2)]]
    corner_pr = make_corner_pr(1, 4, h, w, corners)
    samples = native.build_samples(1, corner_pr, 0.3, 3, 1024, 0, 0.7)
    assert 0 < len(samples[0]) <= 9


def test_nms_greedy():
    b, cls_p1, sn = 1, 3, 2
    det_pr = numpy.full((b, cls_p1, sn, sn), -10.0, dtype=numpy.float32)
    bbox = numpy.zeros((b, sn, sn, 4), dtype=numpy.float32)
    # two overlapping boxes for class 0 and a separate one for class 1
    det_pr[0, 0, 0, 0] = math.log(0.9)
    bbox[0, 0, 0] = [0.0, 0.0, 0.5, 0.5]
    det_pr[0, 0, 0, 1] = math.log(0.6)
    bbox[0, 0, 1] = [0.05, 0.05, 0.55, 0.55]   # IoU ~0.7 with the first
    det_pr[0, 1, 1, 0] = math.log(0.8)
    bbox[0, 1, 0] = [0.6, 0.6, 0.9, 0.9]

    dets = native.build_detections_nms(0.01, 0.5, 0, det_pr, det_pr, bbox, [4])
    assert len(dets) == 1
    classes = sorted(d[1] for d in dets[0])
    assert classes == [0, 1]
    prs = {d[1]: d[0] for d in dets[0]}
    assert abs(prs[0] - 0.9) < 1e-5  # suppressed the 0.6 box


def test_nms_soft():
    b, cls_p1, sn = 1, 2, 2
    det_pr = numpy.full((b, cls_p1, sn, sn), -10.0, dtype=numpy.float32)
    bbox = numpy.zeros((b, sn, sn, 4), dtype=numpy.float32)
    det_pr[0, 0, 0, 0] = math.log(0.9)
    bbox[0, 0, 0] = [0.0, 0.0, 0.5, 0.5]
    det_pr[0, 0, 0, 1] = math.log(0.6)
    bbox[0, 0, 1] = [0.05, 0.05, 0.55, 0.55]
    dets = native.build_detections_nms(0.01, 0.5, 1, det_pr, det_pr, bbox, [4])
    # soft NMS decays instead of removing: both survive with reduced score
    assert len(dets[0]) == 2
    scores = sorted(d[0] for d in dets[0])
    assert scores[0] < 0.6


def build_detect_model(use_jointfit=False, use_bbox_reg=False,
                       use_indfit=False, use_bounded_iou=False):
    numpy.random.seed(21)
    random.seed(21)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    tags = ""
    if use_jointfit:
        tags += "J"
    if use_bounded_iou:
        tags += "B"
    dnd = "DND%s[0.5,1.0,%s,%s]" % (
        "." + tags if tags else "",
        "1.0" if use_bbox_reg else "0.0",
        "1.0" if use_indfit else "0.0")
    desc = ["C[8,3]", "BN", "A", "DNC[16]", "DNS[2,4,0.01,0.1]",
            "C[16,1]", "BN", "A", dnd]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    return model


def synthetic_batch(batch_size=2):
    x = numpy.random.uniform(0, 1, (batch_size, 3, 16, 16)).astype(numpy.float32)
    metas = []
    for b in range(batch_size):
        metas.append({"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [b % 3],
                      "image_class": b % 3})
    return x, metas


@pytest.mark.parametrize("variant", ["plain", "bboxreg", "jointfit", "indfit",
                                     "bounded"])
def test_detection_train_step(variant):
    model = build_detect_model(
        use_jointfit=(variant == "jointfit"),
        use_bbox_reg=(variant in ("bboxreg", "bounded")),
        use_indfit=(variant == "indfit"),
        use_bounded_iou=(variant == "bounded"))
    x, metas = synthetic_batch()
    trainer = Trainer(model, solver_mode="sgd", seed=5)
    cost, costs = trainer.train_step(x, metas, 0, 0, 0.01, [0.9, 0.999], 0.0)
    assert numpy.isfinite(cost)
    assert len(costs) == 2  # corner + detect


def test_detection_inference():
    model = build_detect_model(use_bbox_reg=True)
    x, metas = synthetic_batch()
    detect_layer = model.layers[-1]
    results = detect_layer.get_detections(model, x, metas,
                                          {"prThreshold": 0.0001,
                                           "nmsThreshold": 0.5})
    assert len(results) == 2
    for r in results:
        assert "detections" in r and "meta" in r


def test_detection_train_then_infer_consistency():
    """Train a few steps on one object; detection pipeline must keep working
    and produce finite outputs."""
    model = build_detect_model(use_bbox_reg=True)
    x, metas = synthetic_batch()
    trainer = Trainer(model, solver_mode="sgd", seed=5)
    for it in range(3):
        cost, _ = trainer.train_step(x, metas, 0, it, 0.01, [0.9, 0.999], 0.0)
        assert numpy.isfinite(cost)
    detect_layer = model.layers[-1]
    results = detect_layer.get_detections(model, x, metas,
                                          {"prThreshold": 0.0001,
                                           "nmsThreshold": 0.5})
    assert len(results) == 2


def test_v2_clustering_model_inference():
    """A v2-style DNS (nms_threshold<1 -> corner clustering) must route
    inference through the host search/clustering path and still work."""
    numpy.random.seed(31)
    random.seed(31)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    desc = ["C[8,3]", "BN", "A", "DNC[16]", "DNS[2,4,0.01,0.1,2,0.7]",
            "C[16,1]", "BN", "A", "DND.JB[0.5,1.0,1.0]"]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    assert sparse.nms_threshold == 0.7 and sparse.local_max == 2

    x, metas = synthetic_batch()
    trainer = Trainer(model, solver_mode="sgd", seed=5)
    cost, _ = trainer.train_step(x, metas, 0, 0, 0.01, [0.9, 0.999], 0.0)
    assert numpy.isfinite(cost)

    results = model.layers[-1].get_detections(
        model, x, metas, {"prThreshold": 0.0001, "nmsThreshold": 0.5})
    assert len(results) == 2


def test_center_corner_model_end_to_end():
    """DNC.C (5-corner center variant, reference denet_corner.py corner_num=5
    and denet_sparse.cc center pairing phases :377-468): training step +
    full detection inference must run with center-reflection candidate
    phases active in the device search."""
    numpy.random.seed(8)
    random.seed(8)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    desc = ["C[8,3]", "BN", "A", "DNC.C[16]", "DNS[2,4,0.01,0.1]",
            "C[16,1]", "BN", "A", "DND[0.5,1.0,1.0,0.0]"]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    dnc = [l for l in model.layers if l.type_name == "denet-corner"][0]
    assert dnc.corner_num == 5

    x, metas = synthetic_batch()
    trainer = Trainer(model, solver_mode="sgd", seed=5)
    for it in range(2):
        cost, _ = trainer.train_step(x, metas, 0, it, 0.02, [0.9, 0.999], 0.0)
        assert numpy.isfinite(cost)

    detect_layer = model.layers[-1]
    dets = detect_layer.get_detections(model, x, metas,
                                       {"prThreshold": 0.001,
                                        "nmsThreshold": 0.5})
    assert len(dets) == 2
    for r in dets:
        assert "detections" in r and "meta" in r
        for pr, cls, bbox in r["detections"]:
            assert 0.0 <= pr <= 1.0 and 0 <= cls < 3 and len(bbox) == 4


@pytest.mark.parametrize("v2", [False, True])
def test_update_bn_stats_on_detection_model(v2):
    """model-update-bn's stats pass is a plain eval-mode forward; on a
    detection model the DNS layer must fall back to the inference-style
    device selection (corner search [+ v2 clustering], no gt) instead of
    requiring training aux — this is the x768 BN-recalibration path
    (reference denet/model/update_bn.py run on detection checkpoints,
    README.md:144-145)."""
    from denet_tpu.apps.update_bn import compute_bn_stats

    numpy.random.seed(41)
    random.seed(41)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    dns = "DNS[2,4,0.01,0.1,2,0.7]" if v2 else "DNS[2,4,0.01,0.1]"
    desc = ["C[8,3]", "BN", "A", "DNC[16]", dns,
            "C[16,1]", "BN", "A", "DND[0.5,1.0]"]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    # a couple of train steps so corners carry signal (and BN EMAs move)
    x, metas = synthetic_batch()
    trainer = Trainer(model, solver_mode="sgd", seed=5)
    for it in range(2):
        trainer.train_step(x, metas, 0, it, 0.02, [0.9, 0.999], 0.0)

    data_x = numpy.random.uniform(0, 1, (4, 3, 16, 16)).astype(numpy.float32)
    bn_layers, results = compute_bn_stats(model, data_x, 2)
    assert len(bn_layers) == 2
    for (layer, state), (mean, stdinv) in zip(bn_layers, results):
        assert numpy.all(numpy.isfinite(mean))
        assert numpy.all(numpy.isfinite(stdinv)) and numpy.all(stdinv > 0)
        assert mean.shape == numpy.asarray(state["mean"]).shape


def test_update_bn_is_self_consistent():
    """The one-jit BN recalibration must be SELF-CONSISTENT: installing its
    results and collecting again must return the same statistics (the
    reference updates layers sequentially — update_bn.py:55-80 — so each
    layer is measured under its upstream layers' true stats; a collection
    normalized by stale EMAs is not a fixed point and destroyed the x768
    surgery model before the round-4 fix: PERF.md 'update_bn one-pass
    inconsistency')."""
    import jax.numpy as jnp

    from denet_tpu.apps.update_bn import compute_bn_stats

    numpy.random.seed(13)
    random.seed(13)
    model = Model()
    model.batch_size = 2
    model.class_num = 4
    model.class_labels = {str(i): i for i in range(4)}
    model.build(["C[8,3]", "BN", "A", "C[8,3]", "BN", "A", "P[2]", "R"],
                (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    # deliberately WRONG running stats (large drift — the regime where the
    # stale-normalized collection breaks down)
    rng = numpy.random.RandomState(7)
    for state in model.state:
        if state and "mean" in state:
            state["mean"] = rng.normal(3.0, 1.0, state["mean"].shape).astype(
                numpy.float32)
            state["stdinv"] = rng.uniform(0.1, 4.0,
                                          state["stdinv"].shape).astype(
                numpy.float32)

    data_x = numpy.random.uniform(0, 1, (4, 3, 16, 16)).astype(numpy.float32)

    bn_layers, results = compute_bn_stats(model, data_x, 2)
    for (layer, state), (mean, stdinv) in zip(bn_layers, results):
        state["mean"] = jnp.asarray(mean)
        state["stdinv"] = jnp.asarray(stdinv)
    model.invalidate_cached_params()

    _, results2 = compute_bn_stats(model, data_x, 2)
    for (m1, s1), (m2, s2) in zip(results, results2):
        numpy.testing.assert_allclose(m1, m2, atol=1e-4)
        numpy.testing.assert_allclose(s1, s2, rtol=1e-4)
