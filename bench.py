"""Headline benchmark: DeNet-34 skip detection inference rate (images/sec).

Protocol mirrors the reference's published numbers (BASELINE.md): 512x512
input crops, batch size 8, full detection pipeline per batch — trunk +
corner head forward, corner->bbox pairing search, sparse RoI gather +
detection head forward, per-class NMS — with all detections materialized on
host by the end of the timed window.  The pipeline runs as ONE fused jit on
device (Model.build_full_detect_fn) with pipelined batches and a single
deferred result drain (the axon remote link permanently degrades upload
bandwidth ~30x after any device->host read, so the streaming loop stays
download-free; see get_detections_batched(defer_downloads=True)).
Baseline: 82 Hz on a Titan X (Maxwell) for DeNet34 skip v1
(reference README.md:122).

The untrained corner/detect heads are perturbed to a *realistic trained-model
operating point* (calibrated ~64 corners per type per image; null class
dominant so per-class NMS sees a trained-like candidate load) — otherwise a
0-init head finds zero corners (no search work, unfairly fast) or a uniform
head passes every sample for every class (cap-saturated, unfairly slow).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import math
import sys
import time

import numpy

BASELINE_HZ = 82.0  # DeNet34 skip v1, reference README.md:122


def perturb_heads_host(model):
    """Host-side (numpy, pre-upload) head perturbation: random corner-head
    weights; detect head random with a dominant null class."""
    dnc = [l for l in model.layers if l.type_name == "denet-corner"][0]
    cn = dnc.corner_num
    conv = model.params[dnc.layer_index]["layers"][1]
    rng = numpy.random.RandomState(0)
    conv["weight"] = numpy.array(conv["weight"])
    conv["weight"][:cn] = rng.normal(0.0, 0.05, conv["weight"][:cn].shape)
    conv["bias"] = numpy.array(conv["bias"])
    conv["bias"][:cn] = 0.0

    dnd = model.layers[-1]
    conv_d = model.params[dnd.layer_index]["layers"][1]
    rng = numpy.random.RandomState(1)
    conv_d["weight"] = rng.normal(0.0, 0.5,
                                  numpy.shape(conv_d["weight"])).astype(numpy.float32)
    b = numpy.array(conv_d["bias"])
    b[dnd.null_class] = 6.0
    conv_d["bias"] = b


def calibrate_corner_bias_device(model, x, target_corners=64):
    """Shift each corner type's bias so ~target_corners positions per
    (image, type) pass the threshold — computed and assigned entirely ON
    DEVICE (a host read here would poison upload bandwidth for the loop)."""
    import jax
    import jax.numpy as jnp
    from denet_tpu.core.model import _keepalive

    dnc = [l for l in model.layers if l.type_name == "denet-corner"][0]
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    cn = dnc.corner_num
    conv = model.params[dnc.layer_index]["layers"][1]

    key = (False, False)
    if key not in sparse._corner_fn:
        sparse._corner_fn[key] = model.build_corner_fn(
            dnc.layer_index, train=False, return_sample=False)
    corner_diff = sparse._corner_fn[key](model.params, model.state, x)[0]

    bound = -0.5 * math.log(sparse.corner_threshold /
                            (1.0 - sparse.corner_threshold))

    def bias_fn(diff, old_bias):
        lh = 0.5 * diff                                   # (B, cn, H, W)
        flat = lh.reshape(lh.shape[0], cn, -1)
        # target-th smallest lh per (image, type)
        q = -jax.lax.top_k(-flat, target_corners + 1)[0][..., target_corners]
        shift = jnp.median(bound - q, axis=0)             # (cn,)
        return jnp.concatenate([shift, old_bias[cn:]])

    fn = _keepalive(jax.jit(bias_fn))
    conv["bias"] = fn(corner_diff, conv["bias"])


def main():
    import jax
    import jax.numpy as jnp

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model

    logging.init(level="warning")

    batch, size = 8, 512
    model = _build_detect_model(batch, size, class_num=80, variant="skip")
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]

    perturb_heads_host(model)
    model.ensure_on_device()

    rng = numpy.random.RandomState(3)
    # uint8 image batch (decoded to [0,1] on device — deployment input format)
    x = rng.randint(0, 256, (batch, 3, size, size)).astype(numpy.uint8)
    metas = [{"bbox": [], "class": []} for _ in range(batch)]

    calibrate_corner_bias_device(model, jnp.asarray(x))

    params = {"prThreshold": 0.01, "nmsThreshold": 0.5}

    # warmup: compile + run the fused function, then force the axon link's
    # one-time d2h mode transition OUTSIDE the timed window
    key = (0.01, 0.5, 256, 128, 100)
    detect_layer._full_fn[key] = model.build_full_detect_fn(
        detect_layer, *key[:2], corner_k=key[2], top_m=key[3], top_n=key[4])
    fn = detect_layer._full_fn[key]
    for _ in range(2):
        r = fn(model.params, model.state, jnp.asarray(x))
        jax.block_until_ready(r)
    numpy.asarray(r[1])   # first d2h read: one-time link transition
    for _ in range(2):
        r = fn(model.params, model.state, jnp.asarray(x))
        numpy.asarray(r[0])

    iters = 40
    t0 = time.time()
    results = detect_layer.get_detections_batched(
        model, ((x, metas) for _ in range(iters)), params)
    dt = time.time() - t0
    assert len(results) == batch * iters
    hz = batch * iters / dt

    print(json.dumps({"metric": "denet34_skip_detect_inference",
                      "value": round(hz, 2),
                      "unit": "images/sec",
                      "vs_baseline": round(hz / BASELINE_HZ, 3)}))


if __name__ == "__main__":
    sys.exit(main())
