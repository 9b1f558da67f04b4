"""Device corner clustering (ops/cluster_device) parity vs the native host
implementation (ops/native cluster_samples, reference apply_cluster
semantics denet_sparse.cc:165-242)."""
import numpy
import pytest

from denet_tpu.ops import native
from denet_tpu.ops.cluster_device import cluster_candidates_host_format


def random_candidates(rng, batch, n, count=None, scale=0.25):
    """Random candidate arrays sorted by pr desc (the corner-search output
    contract)."""
    x0 = rng.uniform(0, 1 - scale, (batch, n))
    y0 = rng.uniform(0, 1 - scale, (batch, n))
    w = rng.uniform(0.02, scale, (batch, n))
    h = rng.uniform(0.02, scale, (batch, n))
    bbox = numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1).astype(numpy.float32)
    pr = -numpy.sort(-rng.uniform(0.01, 1.0, (batch, n)).astype(numpy.float32))
    if count is None:
        count = numpy.full((batch,), n, numpy.int32)
    return bbox, pr, numpy.asarray(count, numpy.int32)


def _perturb_corner_head(model, seed=11):
    """Re-init the corner head to a mid-density operating point: the fresh
    head inits to "everything is background" (bias 5.0, denet_corner.py);
    bias offset 3.0 measured ~13 candidates vs the toy ref cap 160."""
    import jax
    det = model.layers[-1]
    ci = det.sparse_layer.corner_layer.layer_index
    prng = numpy.random.RandomState(seed)

    def perturb(a):
        a = numpy.asarray(a)
        out = prng.normal(0, 1.0, a.shape).astype(numpy.float32)
        return out + 3.0 if a.ndim == 1 else out

    model.params[ci] = jax.tree_util.tree_map(perturb, model.params[ci])


def _assert_same_detections(a, b):
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert len(ra["detections"]) == len(rb["detections"])
        for (pa, ca, ba), (pb, cb, bb) in zip(ra["detections"],
                                              rb["detections"]):
            assert ca == cb and abs(pa - pb) < 1e-6
            numpy.testing.assert_allclose(ba, bb, atol=1e-6)


def assert_cluster_parity(bbox, pr, count, threshold, input_num, output_num):
    hb, hp, hc = native.cluster_samples(bbox, pr, count, threshold,
                                        input_num, output_num)
    db, dp, dc = cluster_candidates_host_format(bbox, pr, count, threshold,
                                                input_num, output_num)
    numpy.testing.assert_array_equal(hc, dc)
    for b in range(bbox.shape[0]):
        n = int(hc[b])
        numpy.testing.assert_allclose(dp[b, :n], hp[b, :n], rtol=0, atol=0)
        numpy.testing.assert_allclose(db[b, :n], hb[b, :n], rtol=0, atol=0)


@pytest.mark.parametrize("seed,n,out", [(0, 64, 16), (1, 200, 32),
                                        (2, 500, 64), (3, 977, 128)])
def test_parity_random(seed, n, out):
    rng = numpy.random.RandomState(seed)
    bbox, pr, count = random_candidates(rng, 3, n)
    assert_cluster_parity(bbox, pr, count, 0.7, n, out)


def test_parity_varied_counts_and_threshold():
    rng = numpy.random.RandomState(7)
    bbox, pr, _ = random_candidates(rng, 4, 300)
    count = numpy.array([300, 120, 33, 0], numpy.int32)
    for thr in (0.5, 0.7, 0.9):
        assert_cluster_parity(bbox, pr, count, thr, 300, 48)


def test_parity_input_cap():
    # input_num < count: only the top input_num by pr enter clustering
    rng = numpy.random.RandomState(11)
    bbox, pr, count = random_candidates(rng, 2, 256)
    assert_cluster_parity(bbox, pr, count, 0.7, 100, 40)


def test_passthrough_when_under_output_num():
    # count <= output_num: the reference skips clustering entirely; the
    # unconditional device formulation must still return the input verbatim
    rng = numpy.random.RandomState(5)
    bbox, pr, count = random_candidates(rng, 2, 64)
    db, dp, dc = cluster_candidates_host_format(bbox, pr, count, 0.7,
                                                64, 64)
    numpy.testing.assert_array_equal(dc, count)
    numpy.testing.assert_allclose(db, bbox, atol=0)
    numpy.testing.assert_allclose(dp, pr, atol=0)


def test_transitive_chain_merges_to_one_cluster():
    # A-B and B-C overlap above threshold but A-C don't: the greedy merge
    # (== connected components) puts all three in ONE cluster; with
    # output_num = 2 the quota then keeps the best 2 of that single cluster
    # plus the far singleton D
    boxes = numpy.array([[[0.10, 0.1, 0.30, 0.3],     # A
                          [0.13, 0.1, 0.33, 0.3],     # B (IoU~0.74 vs A)
                          [0.16, 0.1, 0.36, 0.3],     # C (IoU~0.74 vs B)
                          [0.70, 0.7, 0.90, 0.9]]],   # D far away
                        numpy.float32)
    pr = numpy.array([[0.9, 0.8, 0.7, 0.6]], numpy.float32)
    count = numpy.array([4], numpy.int32)
    hb, hp, hc = native.cluster_samples(boxes, pr, count, 0.5, 4, 2)
    db, dp, dc = cluster_candidates_host_format(boxes, pr, count, 0.5, 4, 2)
    numpy.testing.assert_array_equal(hc, dc)
    numpy.testing.assert_allclose(db[0, :int(dc[0])], hb[0, :int(hc[0])])
    # chain collapsed: at most one member of {A,B,C} plus D survive the
    # 2-slot quota, and the survivors are pr-ordered
    kept = db[0, :int(dc[0])]
    in_chain = (kept[:, 0] < 0.5).sum()
    assert in_chain == 1 and int(dc[0]) == 2


def test_cluster_cap_distinct_sizes():
    # more clusters than output_num: keep the largest (size desc); craft 4
    # well-separated clusters with sizes 4,3,2,1 and output_num=2
    groups = [4, 3, 2, 1]
    boxes, prs = [], []
    p = 0.99
    for gi, g in enumerate(groups):
        cx = 0.12 + 0.25 * gi
        for k in range(g):
            off = 0.004 * k
            boxes.append([cx + off, 0.1, cx + 0.08 + off, 0.3])
            prs.append(p)
            p -= 0.01
    order = numpy.argsort(-numpy.asarray(prs))
    boxes = numpy.asarray(boxes, numpy.float32)[order][None]
    prs = numpy.asarray(prs, numpy.float32)[order][None]
    count = numpy.array([len(groups) and boxes.shape[1]], numpy.int32)
    assert_cluster_parity(boxes, prs, count, 0.5, boxes.shape[1], 2)
    _, _, dc = cluster_candidates_host_format(boxes, prs, count, 0.5,
                                              boxes.shape[1], 2)
    assert int(dc[0]) == 2   # 2 clusters kept, quota 1 each


def build_v2_model(batch_size=2, sn=4):
    import random as pyrandom

    from denet_tpu.core.model import Model

    numpy.random.seed(31)
    pyrandom.seed(31)
    model = Model()
    model.batch_size = batch_size
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    desc = ["C[8,3]", "BN", "A", "DNC[16]",
            "DNS[2,%d,0.01,0.1,2,0.7]" % sn,
            "C[16,1]", "BN", "A", "DND.JB[0.5,1.0,1.0]"]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    return model


def test_v2_fused_inference_matches_host_cluster_path():
    """The round-3 fused v2 pipeline (device corner search -> device
    clustering -> detect -> NMS in ONE jit) must produce the same
    detections as the host-clustering round-trip path on the same model
    (small configs stay under the device cluster cap, so the candidate
    stream into clustering is identical)."""
    model = build_v2_model()
    rng = numpy.random.RandomState(3)
    x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [b % 3]}
             for b in range(2)]

    base = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    dev = model.layers[-1].get_detections(model, x, metas, dict(base))
    host = model.layers[-1].get_detections(
        model, x, metas, dict(base, useDeviceCluster=0))
    assert len(dev) == len(host) == 2
    for rd, rh in zip(dev, host):
        assert len(rd["detections"]) == len(rh["detections"])
        for (pd, cd, bd), (ph, ch, bh) in zip(
                sorted(rd["detections"], key=lambda d: (-d[0], d[1])),
                sorted(rh["detections"], key=lambda d: (-d[0], d[1]))):
            assert cd == ch
            assert abs(pd - ph) < 1e-5
            numpy.testing.assert_allclose(bd, bh, atol=1e-5)


def test_v2_fused_device_target_training():
    """v2 (clustering) models train with the fully-fused device-target
    step since round 3: on-device corner search + clustering + selection,
    finite and decreasing cost."""
    from denet_tpu.train.trainer import Trainer

    model = build_v2_model()
    trainer = Trainer(model, solver_mode="nesterov", seed=5,
                      device_targets=True, gt_cap=8)
    rng = numpy.random.RandomState(2)
    x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6), (0.55, 0.55, 0.9, 0.9)],
              "class": [0, 1]},
             {"bbox": [(0.2, 0.3, 0.6, 0.7)], "class": [2]}]
    costs = []
    for it in range(25):
        c, _ = trainer.train_step(x, metas, 0, it, 0.05, [0.9, 0.999], 1e-4)
        costs.append(c)
    assert all(numpy.isfinite(c) for c in costs)
    assert costs[-1] < costs[0] * 0.9


def test_full_v2_chain_matches_host_build_samples():
    """Device corner search (local_max, oversampled) + device clustering ==
    host build_samples with clustering, as exact bbox sets.

    Regression guard for the round-3 local-max bug: the device search used
    to mask non-local-max positions to +inf in the SHARED map, so the
    TL x BR pairing read +inf at TR/BL crossing positions (the reference
    probes the raw heatmap there, denet_sparse.cc) and dropped almost every
    pair."""
    from denet_tpu.ops.corner_search_device import corner_search

    rng = numpy.random.RandomState(19)
    b, cn, h, w = 2, 4, 24, 24
    # mostly non-corner (d >> 0) with clumps of strong corners (d << 0):
    # clumps exercise the local-max filter; only clump minima survive
    # selection but crossings must still read the raw map.  The clump count
    # keeps total candidates under out_count — at the truncation boundary
    # device/host candidate order can differ by one f32 ulp of the pair
    # score (one-hot-matmul sum vs sequential adds), which is tail noise in
    # production but would break set equality here.
    d = rng.uniform(5.0, 9.0, (b, cn, h, w)).astype(numpy.float32)
    for bi in range(b):
        for ci in range(cn):
            for _ in range(4):
                y, x = rng.randint(2, h - 2), rng.randint(2, w - 2)
                d[bi, ci, y - 1:y + 2, x - 1:x + 2] = rng.uniform(
                    -6, -1, (3, 3))

    sn, thr, lm, cthr = 4, 0.01, 2, 0.7
    over = 10 * sn * sn
    bb, pr, cnt = corner_search(d, thr, sn, corner_k=256, out_count=over,
                                local_max=lm)
    db, dp, dc = cluster_candidates_host_format(
        numpy.asarray(bb), numpy.asarray(pr), numpy.asarray(cnt), cthr,
        over, sn * sn)
    hb, hp, hc = native.build_samples_arrays(2, d, thr, sn, 1024, lm, cthr)
    numpy.testing.assert_array_equal(dc, hc)
    assert int(dc.sum()) > 8   # non-degenerate scene
    for bi in range(b):
        ds = {tuple(numpy.round(v, 5)) for v in db[bi][:int(dc[bi])]}
        hs = {tuple(numpy.round(v, 5)) for v in hb[bi][:int(hc[bi])]}
        assert ds == hs


# -- serving cluster-cap policy (round 4) ------------------------------------

def test_auto_cap_policy():
    """auto_cap: next pow2 >= margin*max_count, floored at sample_count,
    clamped to the reference cap 10*sample_count."""
    from denet_tpu.ops.cluster_device import auto_cap
    # the wide34_v2 case from the round-3 cap study: observed max 706
    assert auto_cap(706, 576) == 1024
    assert auto_cap(706, 576, margin=2.0) == 2048
    # tiny observed count still floors at the output budget's pow2
    assert auto_cap(5, 576) == 1024
    # clamped to the reference-faithful cap
    assert auto_cap(10 ** 9, 576) == 5760
    assert auto_cap(0, 4) == 4


def test_auto_cap_opt_policy():
    """auto_cap_opt: expected-cost argmin — serve at the distribution's
    working cap and escalate rare crowded batches instead of sizing every
    batch for the worst draw (the round-4 sweep's failure mode: retrained
    v2 rows all calibrated to cap 4096 off single crowded draws)."""
    from denet_tpu.ops.cluster_device import auto_cap, auto_cap_opt
    sn2, b, tp = 576, 8, 0.0087   # wide34_v2's measured operating point
    # tight distribution: the 256-grid serves just above the observed max
    # (768 >= 700, escalation-free) where the pow2 max policy pays 1024
    assert auto_cap(700, sn2) == 1024
    assert auto_cap_opt([700] * 12, sn2, b, tp) == 768
    # heavy tail: one crowded batch of 12 — with the 256 grid the argmin
    # covers the tail at 2304 (f=0) rather than escalating it, because the
    # quadratic penalty of 2304 is smaller than 1/12 reference-cap reruns
    # (the max policy would force cap 4096 on every batch)
    assert auto_cap(2300, sn2) == 4096
    assert auto_cap_opt([500] * 11 + [2300], sn2, b, tp) == 2304
    # a rarer tail (1/48) tips the argmin back to serve-low + escalate
    # (768 is the smallest grid point >= the sample_count floor 576)
    assert auto_cap_opt([500] * 47 + [2300], sn2, b, tp) == 768
    # all batches crowded: lane-aligned 2304, not pow2 4096 — the round-4
    # wide34_v2 case (observed max 2283 over 12 rotated batches)
    assert auto_cap_opt([2283] * 12, sn2, b, tp) == 2304
    # pathological counts: the reference cap itself (escalation-free) wins
    assert auto_cap_opt([10 ** 6] * 12, sn2, b, tp) == 5760
    # f must use RAW counts (the serving guard's rule), not margin-scaled:
    # the wide101_v2 calibration profile — several batches near (but
    # under) 2048 — serves at 2048 with ZERO escalations; margin-scaling f
    # mispicked 4096 here (the first hardware A/B of this policy)
    wide101 = [1700] * 6 + [900] * 5 + [1870]
    assert auto_cap_opt(wide101, sn2, b, tp) == 2048
    # the grid floors at sample_count and never exceeds the reference cap
    assert auto_cap_opt([0] * 12, sn2, b, tp) >= sn2
    assert auto_cap_opt([5759] * 12, 576, b, tp) == 5760


def test_calibrated_cap_lossless_and_escalation():
    """Any cap >= the observed candidate count returns exactly the
    reference-cap detections (losslessness the serving default relies on);
    a saturating cap escalates inside get_detections and STILL returns the
    reference result — results never depend on the cap choice."""
    model = build_v2_model()
    det = model.layers[-1]
    _perturb_corner_head(model)

    rng = numpy.random.RandomState(5)
    x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [b % 3]}
             for b in range(2)]
    base = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    sn = det.sparse_layer.sample_num
    ref_cap = 10 * sn * sn

    ref = det.get_detections(model, x, metas, dict(base, clusterCap=ref_cap))
    assert sum(len(r["detections"]) for r in ref) > 0

    cap, max_count = model.calibrate_cluster_cap(det, [x])
    assert max_count > 0, "degenerate scene: no candidates"
    assert cap >= max_count
    assert cap < ref_cap, "cap must be non-trivially below the reference"
    assert model.cluster_cap == cap

    assert_same = _assert_same_detections

    # calibrated default (no explicit clusterCap) == reference cap result
    auto = det.get_detections(model, x, metas, dict(base))
    assert_same(auto, ref)

    # a deliberately saturating cap (1 < observed count) escalates to the
    # reference cap and returns the identical result
    sat = det.get_detections(model, x, metas, dict(base, clusterCap=1))
    assert_same(sat, ref)

    # "opt" policy: installs a cap, records calibration stats, and the
    # serving default still returns the reference-cap result exactly
    cap_o, max_o = model.calibrate_cluster_cap(det, [x], policy="opt")
    assert max_o == max_count
    assert model.cluster_cap == cap_o
    st = model.cluster_cap_stats
    assert st["policy"] == "opt" and st["batch_maxima"] == [max_count]
    assert "t_prefix_ms" in st and st["cap"] == cap_o
    auto_opt = det.get_detections(model, x, metas, dict(base))
    assert_same(auto_opt, ref)


def test_cap_calib_serving_knob():
    """--params capCalib=N: the serving entries self-calibrate + install
    the cluster cap from the first N batches (opt policy by default) and
    return reference-cap-exact detections."""
    model = build_v2_model()
    det = model.layers[-1]
    _perturb_corner_head(model)

    rng = numpy.random.RandomState(5)
    xs = [rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
          for _ in range(2)]
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [b % 3]}
             for b in range(2)]
    base = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    sn = det.sparse_layer.sample_num
    ref_cap = 10 * sn * sn

    refs = [det.get_detections(model, x, metas,
                               dict(base, clusterCap=ref_cap)) for x in xs]
    assert sum(len(r["detections"]) for rs in refs for r in rs) > 0

    assert_same = _assert_same_detections

    # per-batch serving entry: calibrates over the first 2 batches (the
    # second batch completes the window and installs the cap)
    assert getattr(model, "cluster_cap", None) is None
    p = dict(base, capCalib=2)
    got = [det.get_detections(model, x, metas, p) for x in xs]
    assert model.cluster_cap is not None
    assert model.cluster_cap < ref_cap
    assert model.cluster_cap_stats["policy"] == "opt"
    for g, r in zip(got, refs):
        assert_same(g, r)
    # post-calibration serving uses the installed cap, still exact
    assert_same(det.get_detections(model, xs[0], metas, base), refs[0])

    # batched serving entry on a fresh model state (capPolicy=max variant)
    model2 = build_v2_model()
    _perturb_corner_head(model2)
    det2 = model2.layers[-1]
    batched = det2.get_detections_batched(
        model2, iter([(x, metas) for x in xs]),
        dict(base, capCalib=2, capPolicy="max"))
    assert model2.cluster_cap is not None
    assert model2.cluster_cap_stats["policy"] == "max"
    flat_ref = [r for rs in refs for r in rs]
    assert_same(batched, flat_ref)


def test_distinct_second_quota_variant():
    """distinct_second=True: a cluster's second kept member is the one
    least-overlapping the representative, not the next-best by pr."""
    import jax.numpy as jnp

    from denet_tpu.ops.cluster_device import cluster_candidates

    # one component of three: A (rep), B (near-duplicate of A, higher pr),
    # C (partial overlap, lower pr).  quota at output_num=2 keeps 2 members.
    bbox = numpy.array([[[0.0, 0.0, 1.0, 1.0],
                         [0.02, 0.0, 1.02, 1.0],
                         [0.4, 0.0, 1.4, 1.0],
                         [0, 0, 0, 0]]], numpy.float32)
    pr = numpy.array([[0.9, 0.8, 0.7, 0.0]], numpy.float32)
    count = numpy.array([3], numpy.int32)

    def run(**kw):
        b, p, c = cluster_candidates(jnp.asarray(bbox), jnp.asarray(pr),
                                     jnp.asarray(count), 0.3, 2, 4, **kw)
        return numpy.asarray(b)[0], numpy.asarray(p)[0], int(c[0])

    b_def, p_def, c_def = run()
    assert c_def == 2
    numpy.testing.assert_allclose(b_def[1], bbox[0, 1])   # B: next-best pr

    b_ds, p_ds, c_ds = run(distinct_second=True)
    assert c_ds == 2
    numpy.testing.assert_allclose(b_ds[0], bbox[0, 0])    # rep unchanged
    numpy.testing.assert_allclose(b_ds[1], bbox[0, 2])    # C: least overlap


def test_batched_path_escalates_saturated_cap():
    """get_detections_batched (the predict-CLI serving path) must also
    return reference-cap-exact results under a saturating clusterCap: the
    escalation happens at conversion/drain time, outside the download-free
    dispatch loop."""
    model = build_v2_model()
    det = model.layers[-1]
    _perturb_corner_head(model)

    rng = numpy.random.RandomState(5)
    batches = []
    for b in range(2):
        x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
        metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [i % 3]}
                 for i in range(2)]
        batches.append((x, metas))
    base = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    sn = det.sparse_layer.sample_num

    for defer in (False, True):
        ref = det.get_detections_batched(
            model, iter(batches), dict(base, clusterCap=10 * sn * sn),
            defer_downloads=defer)
        sat = det.get_detections_batched(
            model, iter(batches), dict(base, clusterCap=1),
            defer_downloads=defer)
        assert sum(len(r["detections"]) for r in ref) > 0
        _assert_same_detections(ref, sat)


def test_defer_drain_chunking_preserves_order_and_results():
    """The deferred path drains every drainChunk batches to bound input
    retention (each guarded batch keeps its input alive for a possible
    escalation).  Crossing multiple chunk boundaries — with a saturating
    cap so every batch escalates at drain time — must preserve batch order
    and reference-cap-exact results."""
    model = build_v2_model()
    det = model.layers[-1]
    _perturb_corner_head(model)

    rng = numpy.random.RandomState(5)
    batches = []
    for b in range(5):
        x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)
        metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [(b + i) % 3],
                  "batch": b, "slot": i} for i in range(2)]
        batches.append((x, metas))
    base = {"prThreshold": 0.0001, "nmsThreshold": 0.5}
    sn = det.sparse_layer.sample_num

    ref = det.get_detections_batched(
        model, iter(batches), dict(base, clusterCap=10 * sn * sn),
        defer_downloads=True)
    got = det.get_detections_batched(
        model, iter(batches), dict(base, clusterCap=1, drainChunk=2),
        defer_downloads=True)
    assert sum(len(r["detections"]) for r in ref) > 0
    _assert_same_detections(ref, got)
    # order: metas flow through drains in dispatch order
    assert [(r["meta"]["batch"], r["meta"]["slot"]) for r in got] == \
        [(b, i) for b in range(5) for i in range(2)]


def test_cluster_distinct2_knob_default_and_env():
    """cluster_distinct2 defaults off (reference-faithful quota) and the
    env knob flips it for training runs (queue_r5b wide34_v2d)."""
    import subprocess
    import sys

    from denet_tpu.layers.denet_sparse import DeNetSparseLayer

    assert DeNetSparseLayer.cluster_distinct2 is False
    out = subprocess.run(
        [sys.executable, "-c",
         "from denet_tpu.layers.denet_sparse import DeNetSparseLayer as L;"
         "print(L.cluster_distinct2)"],
        capture_output=True, text=True,
        env={"DENET_TPU_CLUSTER_DISTINCT2": "1", "PATH": "/usr/bin:/bin",
             "JAX_PLATFORMS": "cpu"})
    assert out.stdout.strip() == "True", out.stderr[-500:]


def test_auto_cap_opt_warns_on_unused_margin():
    """auto_cap_opt accepts ``margin`` only for signature parity with
    auto_cap and deliberately ignores it (escalation supersedes drift
    headroom) — a caller passing a non-default margin must be told it gets
    no headroom (ADVICE r4), and the default must stay silent."""
    import warnings
    from denet_tpu.ops.cluster_device import auto_cap_opt
    sn2, b, tp = 576, 8, 0.0087
    with pytest.warns(UserWarning, match="ignores margin"):
        cap = auto_cap_opt([700] * 12, sn2, b, tp, margin=2.0)
    assert cap == auto_cap_opt([700] * 12, sn2, b, tp)  # and changes nothing
    with warnings.catch_warnings():
        warnings.simplefilter("error")          # default margin: no warning
        auto_cap_opt([700] * 12, sn2, b, tp)
