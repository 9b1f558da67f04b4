"""Golden-value tests for the mAP-sensitive target/cost math: corner heatmap
construction, detection target matching + normalization, bounded-IoU cost.
Expected values hand-computed from the reference semantics
(denet_corner.py:81-134, denet_detect.py:147-313)."""
import math

import jax.numpy as jnp
import numpy

from denet_tpu.core.model import Model


def build_model(use_bbox_reg=False, use_bounded_iou=False, use_jointfit=False,
                use_indfit=False):
    numpy.random.seed(3)
    model = Model()
    model.batch_size = 1
    model.class_num = 2
    model.class_labels = {"a": 0, "b": 1}
    tags = ("." + ("J" if use_jointfit else "") + ("B" if use_bounded_iou else "")
            ).rstrip(".")
    dnd = "DND%s[0.5,1.0,%s,%s]" % (tags, "1.0" if use_bbox_reg else "0.0",
                                    "1.0" if use_indfit else "0.0")
    desc = ["C[4,3,2]", "DNC[8]", "DNS[2,2,0.01,0.0]", dnd]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    return model


def test_corner_target_values():
    model = build_model()
    dnc = model.layers[2]
    assert dnc.type_name == "denet-corner"
    h = w = dnc.height  # 8x8 map (stride 2)

    metas = [{"bbox": [(0.25, 0.25, 0.75, 0.75)], "class": [1]}]
    _idx, val = dnc.get_target(model, None, metas)
    corner = val.reshape(dnc.corner_shape)

    # corners at x0=round(.25*8)=2, x1=round(.75*8)-1=5
    norm = 1.0 / (w * h * 4)
    assert abs(corner[0, 1, 0, 2, 2] - norm) < 1e-9   # TL at (y0,x0)
    assert abs(corner[0, 1, 1, 2, 5] - norm) < 1e-9   # TR at (y0,x1)
    assert abs(corner[0, 1, 2, 5, 2] - norm) < 1e-9   # BL
    assert abs(corner[0, 1, 3, 5, 5] - norm) < 1e-9   # BR
    # background channel complements: (1 - 1) * norm at corner position
    assert abs(corner[0, 0, 0, 2, 2]) < 1e-9
    assert abs(corner[0, 0, 0, 0, 0] - norm) < 1e-9
    # total mass: channel 0 + channel 1 sums to h*w*4*norm = 1
    assert abs(corner.sum() - 1.0) < 1e-5


def test_corner_cost_value():
    """Cost = -mean_b sum(target * log_pr) / log(2); with a uniform corner
    log-pr of log(0.5) everywhere the cost is exactly 1.0."""
    model = build_model()
    dnc = model.layers[2]
    metas = [{"bbox": [(0.25, 0.25, 0.75, 0.75)], "class": [1]}]
    _idx, val = dnc.get_target(model, None, metas)
    target = jnp.asarray(val)
    uniform = jnp.full(dnc.corner_shape, math.log(0.5), dtype=jnp.float32)
    cost = dnc.cost({"corner_pr": uniform}, None, target)
    assert abs(float(cost) - 1.0) < 1e-5


def test_detect_target_matching_and_normalization():
    model = build_model()
    dns = model.layers[3]
    dnd = model.layers[4]
    sn = dns.sample_num  # 2

    gt = (0.1, 0.1, 0.5, 0.5)
    # sample 0 perfectly matches gt; others are far away
    dns.sample_bbox_list = [[(0.5, gt), (0.1, (0.6, 0.6, 0.9, 0.9)),
                             (0.1, (0.0, 0.6, 0.3, 0.9)),
                             (0.1, (0.6, 0.0, 0.9, 0.3))]]
    metas = [{"bbox": [gt], "class": [1]}]
    _idx, val = dnd.get_target(model, None, metas)
    det = val.reshape(dnd.det_shape)  # (1, 3, 2, 2)

    nfactor = sn * sn
    # sample (0,0): gt class 1, normalized per-sample then by sample count
    assert abs(det[0, 1, 0, 0] - 1.0 / nfactor) < 1e-6
    assert abs(det[0, 2, 0, 0]) < 1e-9                  # null cleared
    # unmatched samples keep null class mass
    assert abs(det[0, 2, 0, 1] - 1.0 / nfactor) < 1e-6
    assert abs(det[0, 0, 0, 1]) < 1e-9


def test_bounded_iou_cost_zero_for_perfect_prediction():
    model = build_model(use_bbox_reg=True, use_bounded_iou=True)
    dns = model.layers[3]
    dnd = model.layers[4]
    sn = dns.sample_num

    gt = (0.2, 0.2, 0.6, 0.6)
    dns.sample_bbox_list = [[(0.5, gt)] * (sn * sn)]
    metas = [{"bbox": [gt], "class": [0]}]
    _idx, val = dnd.get_target(model, None, metas)

    # a perfect bbox prediction: bbox_predict == gt for every sample
    bbox_predict = jnp.tile(jnp.asarray(gt, dtype=jnp.float32),
                            (1, sn, sn, 1))
    det_pr = jnp.log(jnp.full(dnd.det_shape, 1.0 / dnd.det_shape[1]))
    collect = {"det_pr": det_pr, "bbox_predict": bbox_predict,
               "bbox_reg": jnp.zeros((1, 4, sn, sn))}
    det_e, bbox_e, _ = dnd.get_errors(collect, None, jnp.asarray(val))
    # dx=dy=0 and w/h ratios=1 -> bounded-IoU cost ~0 (eps terms only)
    assert float(jnp.sum(jnp.abs(bbox_e))) < 1e-3


def test_jointfit_target_bins():
    model = build_model(use_jointfit=True)
    dns = model.layers[3]
    dnd = model.layers[4]
    assert dnd.fitness_num == 5
    assert dnd.null_class == 10

    gt = (0.1, 0.1, 0.5, 0.5)
    dns.sample_bbox_list = [[(0.5, gt)] +
                            [(0.1, (0.6, 0.6, 0.9, 0.9))] * 3]
    metas = [{"bbox": [gt], "class": [1]}]
    _idx, val = dnd.get_target(model, None, metas)
    det = val.reshape(dnd.det_shape)  # (1, 11, 2, 2)
    # IoU = 1.0 -> f_rel = 1 -> bin = min(int(5*1), 4) = 4 -> channel 1*5+4=9
    assert det[0, 9, 0, 0] > 0
    assert abs(det[0, 10, 0, 0]) < 1e-9
