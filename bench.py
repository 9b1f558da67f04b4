"""Headline benchmark: DeNet-34 skip detection inference rate (images/sec).

Protocol mirrors the reference's published numbers (BASELINE.md): 512x512
input crops, batch size 8, full detection pipeline per batch — trunk +
corner head forward, host corner->bbox search (native C++), sparse RoI
gather + detection head forward, host NMS.  Baseline: 82 Hz on a Titan X
(Maxwell) for DeNet34 skip v1 (reference README.md:122).

The untrained corner/detect heads are perturbed to a *realistic trained-model
operating point* (calibrated ~64 corners per type per image; null class
dominant so per-class NMS sees a trained-like candidate load) — otherwise a
0-init head finds zero corners (no host work, unfairly fast) or a uniform
head passes every sample for every class (cap-saturated, unfairly slow).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import math
import sys
import time

import numpy

BASELINE_HZ = 82.0  # DeNet34 skip v1, reference README.md:122


def calibrate_corner_head(model, x, target_corners=64):
    """Randomize the corner-head weights, then shift the corner bias so that
    ~target_corners positions per (image, corner-type) pass the 0.01
    threshold (the load a trained detector presents to the host search)."""
    import jax.numpy as jnp

    dnc = [l for l in model.layers if l.type_name == "denet-corner"][0]
    cn = dnc.corner_num
    idx = dnc.layer_index
    conv_params = model.params[idx]["layers"][1]

    rng = numpy.random.RandomState(0)
    w = numpy.array(conv_params["weight"])
    w[:cn] = rng.normal(0.0, 0.05, w[:cn].shape)
    b = numpy.array(conv_params["bias"])
    b[:cn] = 0.0
    conv_params["weight"] = jnp.asarray(w)
    conv_params["bias"] = jnp.asarray(b)

    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    corner_fn = model.build_corner_fn(idx, train=False, return_sample=False)
    corner_pr = numpy.asarray(corner_fn(model.params, model.state, x)[0])

    # corner channel log-pr = -softplus(2*lh); passing threshold t requires
    # lh < -0.5*logit(t).  Shift each corner type's bias so its
    # target_corners-th smallest lh lands exactly on the pass boundary.
    lh = -0.5 * (corner_pr[:, 1] - corner_pr[:, 0])     # (B, cn, H, W)
    q = numpy.partition(lh.reshape(lh.shape[0], cn, -1),
                        target_corners, axis=-1)[:, :, target_corners]
    bound = -0.5 * math.log(sparse.corner_threshold /
                            (1.0 - sparse.corner_threshold))
    b[:cn] = numpy.median(bound - q, axis=0)
    conv_params["bias"] = jnp.asarray(b)


def set_detect_head_operating_point(model):
    """Make the null class dominate det_pr (like a trained detector) so the
    per-class NMS candidate load is realistic rather than cap-saturated."""
    import jax.numpy as jnp

    dnd = model.layers[-1]
    conv_params = model.params[dnd.layer_index]["layers"][1]
    rng = numpy.random.RandomState(1)
    w = numpy.array(conv_params["weight"])
    w[:] = rng.normal(0.0, 0.5, w.shape)
    b = numpy.array(conv_params["bias"])
    b[dnd.null_class] = 6.0
    conv_params["weight"] = jnp.asarray(w)
    conv_params["bias"] = jnp.asarray(b)


def main():
    import jax.numpy as jnp

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model

    logging.init(level="warning")

    batch, size = 8, 512
    model = _build_detect_model(batch, size, class_num=80, variant="skip")
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]

    rng = numpy.random.RandomState(3)
    x = rng.uniform(0, 1, (batch, 3, size, size)).astype(numpy.float32)
    metas = [{"bbox": [], "class": []} for _ in range(batch)]

    calibrate_corner_head(model, jnp.asarray(x))
    set_detect_head_operating_point(model)

    params = {"prThreshold": 0.01, "nmsThreshold": 0.5}

    # warmup (compiles corner + detect functions, builds native ext)
    detect_layer.get_detections(model, x, metas, params)
    detect_layer.get_detections(model, x, metas, params)

    iters = 12
    t0 = time.time()
    for _ in range(iters):
        detect_layer.get_detections(model, x, metas, params)
    dt = time.time() - t0
    hz = batch * iters / dt

    print(json.dumps({"metric": "denet34_skip_detect_inference",
                      "value": round(hz, 2),
                      "unit": "images/sec",
                      "vs_baseline": round(hz / BASELINE_HZ, 3)}))


if __name__ == "__main__":
    sys.exit(main())
