"""Device-side target construction (ops/target_device) parity vs the host
builders (denet_corner.py / denet_detect.py / denet_sparse.py semantics)."""
import jax
import jax.numpy as jnp
import numpy

from denet_tpu.core.model import Model
from denet_tpu.ops import target_device
from denet_tpu.parallel import mesh as mesh_mod
from denet_tpu.train.trainer import Trainer


def build_model(use_bbox_reg=False, use_bounded_iou=False, use_jointfit=False,
                use_indfit=False, batch_size=2, class_num=3):
    numpy.random.seed(3)
    model = Model()
    model.batch_size = batch_size
    model.class_num = class_num
    model.class_labels = {str(i): i for i in range(class_num)}
    tags = ("." + ("J" if use_jointfit else "") +
            ("B" if use_bounded_iou else "")).rstrip(".")
    dnd = "DND%s[0.5,1.0,%s,%s]" % (tags, "1.0" if use_bbox_reg else "0.0",
                                    "1.0" if use_indfit else "0.0")
    desc = ["C[4,3,2]", "DNC[8]", "DNS[2,3,0.01,0.1]", dnd]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    return model


def make_metas(batch_size, class_num, max_n=4, seed=11):
    rng = numpy.random.RandomState(seed)
    metas = []
    for _ in range(batch_size):
        n = rng.randint(1, max_n + 1)
        x0 = rng.uniform(0, 0.6, n)
        y0 = rng.uniform(0, 0.6, n)
        w = rng.uniform(0.1, 0.35, n)
        h = rng.uniform(0.1, 0.35, n)
        metas.append({"bbox": list(zip(x0, y0, x0 + w, y0 + h)),
                      "class": rng.randint(0, class_num, n).tolist()})
    return metas


def gt_arrays(metas, cap=8):
    g = target_device.pack_gt_arrays(metas, cap)
    return tuple(jnp.asarray(a) for a in g)


def test_corner_target_parity():
    model = build_model()
    dnc = model.layers[2]
    metas = make_metas(2, 3)

    _idx, host_val = dnc.get_target(model, None, metas)
    host = host_val.reshape(dnc.corner_shape)

    gt_bbox, _gt_class, gt_count = gt_arrays(metas)
    dev = target_device.corner_target(gt_bbox, gt_count, dnc.height,
                                      dnc.width, dnc.use_center)
    assert dev.shape == dnc.corner_shape
    numpy.testing.assert_array_equal(numpy.asarray(dev), host)


def test_corner_target_parity_center_and_clipped():
    """use_center corners + boxes whose corners fall outside the map."""
    numpy.random.seed(3)
    model = Model()
    model.batch_size = 1
    model.class_num = 2
    model.class_labels = {"a": 0, "b": 1}
    model.build(["C[4,3,2]", "DNC.C[8]", "DNS[2,3,0.01,0.0]", "DND[0.5,1.0]"],
                (3, 16, 16), border_mode="half", weight_init=["he-forward"])
    dnc = model.layers[2]
    assert dnc.use_center
    metas = [{"bbox": [(0.2, 0.2, 0.7, 0.7), (-0.2, 0.1, 0.5, 1.3)],
              "class": [0, 1]}]
    _idx, host_val = dnc.get_target(model, None, metas)
    gt_bbox, _c, gt_count = gt_arrays(metas)
    dev = target_device.corner_target(gt_bbox, gt_count, dnc.height,
                                      dnc.width, True)
    numpy.testing.assert_array_equal(numpy.asarray(dev),
                                     host_val.reshape(dnc.corner_shape))


def _detect_parity(use_bbox_reg=False, use_jointfit=False, use_indfit=False):
    model = build_model(use_bbox_reg=use_bbox_reg, use_jointfit=use_jointfit,
                        use_indfit=use_indfit)
    dns = model.layers[3]
    dnd = model.layers[4]
    sn = dns.sample_num
    metas = make_metas(2, 3)

    # fixed host-side sample set: some overlapping gt, some random
    rng = numpy.random.RandomState(7)
    sample_lists = []
    for b in range(2):
        lst = []
        for bbox in metas[b]["bbox"]:
            # jittered copies of gt (overlaps straddle the 0.5 threshold)
            for d in (0.0, 0.02, 0.08):
                lst.append((0.5, (bbox[0] + d, bbox[1] + d,
                                  bbox[2] + d, bbox[3] + d)))
        while len(lst) < sn * sn:
            x0, y0 = rng.uniform(0, 0.8, 2)
            lst.append((0.1, (x0, y0, x0 + rng.uniform(0.05, 0.2),
                              y0 + rng.uniform(0.05, 0.2))))
        sample_lists.append(lst[:sn * sn])
    dns.sample_bbox_list = sample_lists

    _idx, host_val = dnd.get_target(model, None, metas)

    sample_bbox = jnp.asarray(dns.get_bbox_array(sample_lists))
    gt_bbox, gt_class, gt_count = gt_arrays(metas)
    t = target_device.detect_targets(
        gt_bbox, gt_class, gt_count, sample_bbox, dnd.class_num,
        dnd.overlap_threshold, dnd.use_jointfit, dnd.use_indfit,
        dnd.use_bbox_reg, dnd.fitness_num, dnd.null_class, dnd.s0)

    parts = [numpy.asarray(t["det_pr"]).flatten()]
    if use_bbox_reg:
        parts += [numpy.asarray(t["bbox_valid"]).flatten(),
                  numpy.asarray(t["bbox_reg"]).flatten()]
    if use_indfit:
        parts.append(numpy.asarray(t["indfit_pr"]).flatten())
    dev_val = numpy.concatenate(parts)
    numpy.testing.assert_allclose(dev_val, host_val, atol=1e-6)


def test_detect_target_parity_plain():
    _detect_parity()


def test_detect_target_parity_bbox_reg():
    _detect_parity(use_bbox_reg=True)


def test_detect_target_parity_jointfit():
    _detect_parity(use_jointfit=True, use_bbox_reg=True)


def test_detect_target_parity_indfit():
    _detect_parity(use_indfit=True)


def test_select_samples_device_semantics():
    b, s, sn = 2, 9, 3
    rng = numpy.random.RandomState(0)
    cand = rng.uniform(0, 0.5, (b, s, 4)).astype(numpy.float32)
    cand[..., 2:] += 0.5
    cand_count = jnp.asarray(numpy.array([9, 3], dtype=numpy.int32))
    metas = [{"bbox": [(0.1, 0.1, 0.4, 0.4), (0.5, 0.5, 0.9, 0.9)],
              "class": [0, 1]},
             {"bbox": [(0.2, 0.3, 0.6, 0.7)], "class": [2]}]
    gt_bbox, _c, gt_count = gt_arrays(metas)

    out = target_device.select_samples(
        jnp.asarray(cand), cand_count, gt_bbox, gt_count,
        jax.random.PRNGKey(4), sn, random_sample=0.3, sample_gt=True)
    out = numpy.asarray(out).reshape(b, s, 4)

    # gt injected into the LAST gt_count slots (reverse order)
    numpy.testing.assert_allclose(out[0, s - 1], metas[0]["bbox"][0], atol=1e-6)
    numpy.testing.assert_allclose(out[0, s - 2], metas[0]["bbox"][1], atol=1e-6)
    numpy.testing.assert_allclose(out[1, s - 1], metas[1]["bbox"][0], atol=1e-6)

    # n_keep = 9 - floor(0.3*9) = 7: first 7 slots of image 0 are candidates
    cand_set = {tuple(numpy.round(c, 5)) for c in cand[0]}
    for i in range(7):
        assert tuple(numpy.round(out[0, i], 5)) in cand_set
    # image 1 has only 3 candidates; slots 3..(s-gt-1) are random boxes
    cand_set1 = {tuple(numpy.round(c, 5)) for c in cand[1]}
    hits = sum(tuple(numpy.round(out[1, i], 5)) in cand_set1 for i in range(3))
    assert hits == 3

    # all boxes well-formed
    assert (out[..., 2] >= out[..., 0]).all()
    assert (out[..., 3] >= out[..., 1]).all()
    assert (out >= 0).all() and (out <= 1).all()


def test_device_targets_training_step_and_convergence():
    """Fused device-target training: finite costs, decreasing detection cost
    on a fixed batch, vs the host-target trainer on the same model."""
    model = build_model(use_bbox_reg=True, use_bounded_iou=True)
    trainer = Trainer(model, solver_mode="nesterov", seed=5,
                      device_targets=True, gt_cap=8)
    metas = make_metas(2, 3)
    rng = numpy.random.RandomState(2)
    x = rng.uniform(0, 1, (2, 3, 16, 16)).astype(numpy.float32)

    costs = []
    for it in range(25):
        c, _ = trainer.train_step(x, metas, 0, it, 0.05, [0.9, 0.999], 1e-4)
        costs.append(c)
    assert all(numpy.isfinite(c) for c in costs)
    assert costs[-1] < costs[0] * 0.9


def test_device_targets_mesh_bit_identity():
    """Device-target training is bit-identical single-device vs 8-dev mesh."""
    def run(mesh):
        model = build_model(use_bbox_reg=True, batch_size=8)
        trainer = Trainer(model, solver_mode="sgd", seed=9,
                          device_targets=True, gt_cap=8, mesh=mesh)
        metas = make_metas(8, 3)
        rng = numpy.random.RandomState(6)
        x = rng.uniform(0, 1, (8, 3, 16, 16)).astype(numpy.float32)
        costs = [trainer.train_step(x, metas, 0, it, 0.05, [0.9, 0.999],
                                    1e-4)[0] for it in range(3)]
        return costs, numpy.asarray(model.params[1]["weight"])

    c1, w1 = run(None)
    c2, w2 = run(mesh_mod.make_mesh())
    assert numpy.allclose(c1, c2, atol=1e-5)
    assert numpy.allclose(w1, w2, atol=1e-5)


def test_input_fn_fused_rendering_training():
    """Trainer input_fn: geometry arrays expand to the uint8 image batch
    INSIDE the step jit (data/synthetic_device.make_render_fn) — training is
    finite, converges on a fixed scene, and is deterministic across runs."""
    from denet_tpu.data.synthetic_device import (make_gt_batch,
                                                 make_render_fn)

    def run():
        model = build_model(use_bbox_reg=True)
        render = make_render_fn(2, 16, 3, max_boxes=5)
        trainer = Trainer(model, solver_mode="nesterov", seed=5,
                          device_targets=True, gt_cap=8,
                          input_fn=lambda key, g: render(key, *g))
        rng = numpy.random.RandomState(4)
        metas, boxes, classes, counts = make_gt_batch(rng, 2, 16, 3)
        geo = (boxes, classes, counts)
        costs = [trainer.train_step(geo, metas, 0, it, 0.05,
                                    [0.9, 0.999], 1e-4)[0]
                 for it in range(20)]
        return costs

    costs = run()
    assert all(numpy.isfinite(c) for c in costs)
    assert costs[-1] < costs[0] * 0.9
    assert run() == costs           # deterministic device rng chain


def test_scan_steps_bit_identical_to_sequential():
    """Trainer.train_steps (lax.scan over K steps, one dispatch) reproduces
    K sequential train_step calls in device-target mode: the rng chain, BN
    state, solver slots and params all thread the scan carry.  Costs are
    bit-equal; params are compared at float tolerance (the scan body is a
    separate XLA compilation, so fusion order may differ in the last ulp)."""
    from denet_tpu.data.synthetic_device import (make_gt_batch,
                                                 make_render_fn)

    def make_batches(k):
        rng = numpy.random.RandomState(4)
        out = []
        for _ in range(k):
            metas, boxes, classes, counts = make_gt_batch(rng, 2, 16, 3)
            out.append(((boxes, classes, counts), metas))
        return out

    def build():
        model = build_model(use_bbox_reg=True)
        render = make_render_fn(2, 16, 3, max_boxes=5)
        return model, Trainer(model, solver_mode="nesterov", seed=5,
                              device_targets=True, gt_cap=8,
                              input_fn=lambda key, g: render(key, *g))

    k = 6
    model_a, tr_a = build()
    seq = [tr_a.train_step(x, m, 0, it, 0.05, [0.9, 0.999], 1e-4)[0]
           for it, (x, m) in enumerate(make_batches(k))]

    model_b, tr_b = build()
    totals = numpy.asarray(tr_b.train_steps(make_batches(k), 0, 0.05,
                                            [0.9, 0.999], 1e-4))
    assert totals.shape == (k,)
    assert numpy.allclose(totals, seq, atol=0, rtol=0), (totals, seq)
    for pa, pb in zip(model_a.params, model_b.params):
        for ka in pa:
            if ka == "layers":
                continue
            assert numpy.allclose(numpy.asarray(pa[ka], dtype=numpy.float64),
                                  numpy.asarray(pb[ka], dtype=numpy.float64),
                                  rtol=1e-6, atol=1e-7), ka
    assert model_b.iteration == k   # train_steps advances the counter
