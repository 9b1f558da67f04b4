"""Device-side corner search and NMS vs the native C++ host implementations.

Analogue of the reference's optimized-vs-fallback self-tests
(denet_sparse.py:222-285): the XLA ops must reproduce the host algorithms.
"""

import jax.numpy as jnp
import numpy
import pytest

from denet_tpu.ops import native, nms_device
from denet_tpu.ops.corner_search_device import corner_search


def random_diff_map(rng, b=2, cn=4, h=16, w=16, n_corners=12):
    """Diff maps with ~n_corners detected corners per (image, type)."""
    d = rng.normal(6.0, 1.0, (b, cn, h, w)).astype(numpy.float32)
    for bi in range(b):
        for ci in range(cn):
            for _ in range(n_corners):
                y, x = rng.randint(0, h), rng.randint(0, w)
                d[bi, ci, y, x] = rng.normal(-1.0, 1.5)
    return d


@pytest.mark.parametrize("cn", [4, 5])
def test_corner_search_matches_native(cn):
    rng = numpy.random.RandomState(0)
    diff = random_diff_map(rng, cn=cn)
    sample_num = 8
    thr = 0.01

    bbox_d, pr_d, count_d = corner_search(jnp.asarray(diff), thr, sample_num,
                                          corner_k=64)
    bbox_h, pr_h, count_h = native.build_samples_arrays(
        1, diff, thr, sample_num, 1024, 0, 1.0)

    bbox_d = numpy.asarray(bbox_d)
    pr_d = numpy.asarray(pr_d)
    count_d = numpy.asarray(count_d)

    for b in range(diff.shape[0]):
        nd, nh = int(count_d[b]), int(count_h[b])
        # device may emit a few extra center-phase self-duplicates; the box
        # SET of the top selections must match the host reference
        host = {tuple(numpy.round(bbox_h[b, i], 5)) for i in range(nh)}
        dev = {tuple(numpy.round(bbox_d[b, i], 5)) for i in range(nd)}
        if cn == 4:
            assert nd == nh
            assert dev == host
            assert numpy.allclose(sorted(pr_d[b, :nd]), sorted(pr_h[b, :nh]),
                                  atol=1e-5)
        else:
            # center phases: allow tiny differences from duplicate slots
            assert len(host.symmetric_difference(dev)) <= max(2, nh // 10)


def test_corner_search_ordering():
    """Results must be sorted by descending pr (ascending |sum d|)."""
    rng = numpy.random.RandomState(3)
    diff = random_diff_map(rng)
    _bbox, pr, count = corner_search(jnp.asarray(diff), 0.01, 8, corner_k=64)
    pr = numpy.asarray(pr)
    for b in range(pr.shape[0]):
        n = int(count[b])
        assert all(pr[b, i] >= pr[b, i + 1] - 1e-7 for i in range(n - 1))


def make_nms_inputs(rng, b=2, c=3, sn=4):
    det_pr = rng.uniform(-8.0, 0.0, (b, c + 1, sn, sn)).astype(numpy.float32)
    fitness = det_pr + rng.uniform(-0.5, 0.5, det_pr.shape).astype(numpy.float32)
    bbox = numpy.zeros((b, sn, sn, 4), dtype=numpy.float32)
    for bi in range(b):
        for j in range(sn):
            for i in range(sn):
                x0, y0 = rng.uniform(0, 0.7, 2)
                bbox[bi, j, i] = [x0, y0, x0 + rng.uniform(0.1, 0.3),
                                  y0 + rng.uniform(0.1, 0.3)]
    count = numpy.full((b,), sn * sn, dtype=numpy.int32)
    return det_pr, fitness, bbox, count


def test_device_nms_matches_native():
    rng = numpy.random.RandomState(1)
    det_pr, fitness, bbox, count = make_nms_inputs(rng)

    dets, det_count = nms_device.nms(
        jnp.asarray(det_pr), jnp.asarray(fitness), jnp.asarray(bbox),
        jnp.asarray(count), pr_threshold=0.05, nms_threshold=0.5)
    dev_lists = nms_device.dets_to_lists(dets, numpy.asarray(det_count))

    host_lists = native.build_detections_nms(0.05, 0.5, 0, det_pr, fitness,
                                             bbox, count)

    for b in range(det_pr.shape[0]):
        dev = {(round(p, 5), c, tuple(numpy.round(bb, 5)))
               for p, c, bb in dev_lists[b]}
        host = {(round(p, 5), c, tuple(numpy.round(bb, 5)))
                for p, c, bb in host_lists[b]}
        assert dev == host


def test_device_nms_threshold_and_count():
    rng = numpy.random.RandomState(2)
    det_pr, fitness, bbox, count = make_nms_inputs(rng)
    count[0] = 3  # only first 3 samples valid in image 0

    dets, det_count = nms_device.nms(
        jnp.asarray(det_pr), jnp.asarray(fitness), jnp.asarray(bbox),
        jnp.asarray(count), pr_threshold=0.05, nms_threshold=0.5)
    host_lists = native.build_detections_nms(0.05, 0.5, 0, det_pr, fitness,
                                             bbox, count)
    assert int(det_count[0]) == len(host_lists[0])


def test_device_detection_pipeline_end_to_end():
    """Fused device path vs host path on the same synthetic model."""
    import random
    from tests.test_detection import build_detect_model, synthetic_batch
    random.seed(7)
    numpy.random.seed(7)
    model = build_detect_model(use_bbox_reg=True)
    x, metas = synthetic_batch()
    detect_layer = model.layers[-1]

    res_dev = detect_layer.get_detections(
        model, x, metas, {"prThreshold": 0.0001, "nmsThreshold": 0.5,
                          "useDevicePipeline": 1})
    res_host = detect_layer.get_detections(
        model, x, metas, {"prThreshold": 0.0001, "nmsThreshold": 0.5,
                          "useDevicePipeline": 0})
    assert len(res_dev) == len(res_host) == 2
    for rd in res_dev:
        for pr, cls, bb in rd["detections"]:
            assert 0.0 <= pr <= 1.0
            assert 0 <= cls < model.class_num


def test_batched_detection_with_staging():
    """stage_batches groups uploads without changing results."""
    import random
    from tests.test_detection import build_detect_model, synthetic_batch
    random.seed(9)
    numpy.random.seed(9)
    model = build_detect_model(use_bbox_reg=True)
    batches = []
    for _ in range(4):
        x, metas = synthetic_batch()
        batches.append((x, metas))
    detect_layer = model.layers[-1]
    p = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    r1 = detect_layer.get_detections_batched(model, iter(batches), p)
    r2 = detect_layer.get_detections_batched(model, iter(batches), p,
                                             stage_batches=2)
    assert len(r1) == len(r2) == 8
    for a, b in zip(r1, r2):
        assert len(a["detections"]) == len(b["detections"])
        for da, db in zip(a["detections"], b["detections"]):
            assert abs(da[0] - db[0]) < 1e-5
            assert da[1] == db[1]


def test_device_soft_nms_matches_native():
    rng = numpy.random.RandomState(5)
    det_pr, fitness, bbox, count = make_nms_inputs(rng)

    dets, det_count = nms_device.nms(
        jnp.asarray(det_pr), jnp.asarray(fitness), jnp.asarray(bbox),
        jnp.asarray(count), pr_threshold=0.05, nms_threshold=0.5,
        use_soft_nms=True)
    dev_lists = nms_device.dets_to_lists(dets, numpy.asarray(det_count))
    host_lists = native.build_detections_nms(0.05, 0.5, 1, det_pr, fitness,
                                             bbox, count)
    for b in range(det_pr.shape[0]):
        dev = sorted((round(p, 4), c) for p, c, _ in dev_lists[b])
        host = sorted((round(p, 4), c) for p, c, _ in host_lists[b])
        assert dev == host


def test_nms_fixpoint_suppression_chain():
    """Dead-suppressor revival: A kills B; C overlaps B (not A) so C
    survives only because B is gone; C kills D.  Greedy must keep exactly
    {A, C} — the case where 'suppress everything overlapped' diverges from
    greedy and where the Jacobi fixpoint needs multiple rounds."""
    from denet_tpu.ops.nms_device import nms, dets_to_lists

    b, c, sn = 1, 1, 2
    boxes = numpy.zeros((b, sn, sn, 4), numpy.float32)
    bx = [(0.00, 0.0, 0.40, 0.4), (0.15, 0.0, 0.55, 0.4),
          (0.30, 0.0, 0.70, 0.4), (0.45, 0.0, 0.85, 0.4)]
    for i, v in enumerate(bx):
        boxes[0, i // sn, i % sn] = v
    det = numpy.full((b, c + 1, sn, sn), -10.0, numpy.float32)
    fit = numpy.zeros((b, c + 1, sn, sn), numpy.float32)
    for i, s in enumerate([-0.1, -0.2, -0.3, -0.4]):
        det[0, 0, i // sn, i % sn] = -0.01
        fit[0, 0, i // sn, i % sn] = s
    dets, n = nms(jnp.asarray(det), jnp.asarray(fit), jnp.asarray(boxes),
                  jnp.asarray(numpy.array([4], numpy.int32)),
                  pr_threshold=0.5, nms_threshold=0.3, top_m=4, top_n=4)
    out = dets_to_lists(numpy.asarray(dets), numpy.asarray(n))[0]
    assert sorted(round(r[2][0], 2) for r in out) == [0.0, 0.3]
