"""Headline benchmark: DeNet-34 skip detection inference rate (images/sec).

Protocol mirrors the reference's published numbers (BASELINE.md): 512x512
input crops, batch size 8, full detection pipeline per batch — trunk +
corner head forward, corner->bbox pairing search, sparse RoI gather +
detection head forward, per-class NMS — with all detections materialized on
host by the end of the timed window.  The pipeline runs as ONE fused jit on
device (Model.build_full_detect_fn) over uint8 batches pre-staged in HBM
(the deployment-host NIC stand-in: the relay tunnel's post-readback upload
degradation is a harness artifact, measured separately in PERF.md), and the
window ends with ONE stacked detections download (~770KB/40 batches) that
both drains the device exec queue (block_until_ready does not force remote
execution on this link — only reads do) and materializes every detection
list on host.  Baseline: 82 Hz on a Titan X (Maxwell) for DeNet34 skip v1
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
import os
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
    model.invalidate_cached_params()


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
        tc = min(target_corners, flat.shape[-1] - 1)
        # target-th smallest lh per (image, type)
        q = -jax.lax.top_k(-flat, tc + 1)[0][..., tc]
        shift = jnp.median(bound - q, axis=0)             # (cn,)
        return jnp.concatenate([shift, old_bias[cn:]])

    fn = _keepalive(jax.jit(bias_fn))
    conv["bias"] = fn(corner_diff, conv["bias"])
    model.invalidate_cached_params()


def main():
    # Preempt the background training/probe queue for the duration of the
    # run: the relay serves ONE chip, and concurrent timed windows skew (or
    # stall) both sides.  Queue scripts poll yield_to_bench() between step
    # blocks and pause while this lock is fresh.
    #
    # A CPU-forced run (the test-suite smoke) never touches the chip, so it
    # must not arbitrate: taking the real lock pauses a live trainer for a
    # run that does not need the relay, and the entry wait on the trainer's
    # queue-busy marker can pin the smoke for the whole block (or forever
    # against a wedged holder whose keepalive thread still refreshes it).
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        print("bench: CPU-forced (smoke) — skipping chip arbitration",
              flush=True)
        return _main()
    from denet_tpu.utils import chiplock
    with chiplock.bench_lock(log=lambda m: print(m, flush=True)):
        # the bench does NOT take the chip lease (a paused-but-alive lease
        # holder would deadlock it); log any live holder so the record shows
        # who was attached — holders pause at their next yield point
        if chiplock.lock_age(chiplock.LEASE_PATH) is not None:
            print("bench: chip lease held by live pid %s (holder will pause "
                  "at its next yield point)"
                  % chiplock.chip_lease()._holder_pid(), flush=True)
        return _main()


def _main():
    # space-to-depth stem: mathematically equivalent rewrite of the 7x7/s2
    # 3-channel stem conv (one bf16-ULP accumulation-order difference;
    # fwd+grad parity tested) — 6% pipeline win, see PERF.md
    os.environ.setdefault("DENET_TPU_S2D_STEM", "1")
    import jax
    # honor an explicit JAX_PLATFORMS=cpu (the test-suite smoke) even when
    # the axon sitecustomize force-registers the TPU backend — otherwise the
    # smoke run silently lands on (and can hang behind) the remote chip
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model

    logging.init(level="warning")

    # env overrides let the test suite smoke the full protocol on CPU
    batch = int(os.environ.get("DENET_BENCH_BATCH", 8))
    size = int(os.environ.get("DENET_BENCH_SIZE", 512))
    # trained-weights mode: load a real checkpoint (from
    # scripts/train_flagship_synth.py) instead of perturb+calibrate, so the
    # headline carries genuinely trained head statistics.  The committed
    # synthetic-data checkpoint is the default when present (set
    # DENET_BENCH_MODEL= empty to force the perturb+calibrate protocol;
    # both measured within 4% of each other — PERF.md).
    default_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "models", "denet34_skip_synth512.mdl.gz")
    model_file = os.environ.get(
        "DENET_BENCH_MODEL",
        default_ckpt if (size == 512 and os.path.exists(default_ckpt)) else "")
    if model_file:
        import denet_tpu.core.model as model_mod
        model = model_mod.load_from_file(model_file, batch_size=batch)
        assert tuple(model.data_shape[1:]) == (size, size), model.data_shape
    else:
        model = _build_detect_model(batch, size, class_num=80, variant="skip")
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]

    if not model_file:
        perturb_heads_host(model)
    model.ensure_on_device()

    rng = numpy.random.RandomState(3)
    from denet_tpu.core.model import _keepalive
    from denet_tpu.ops.nms_device import dets_to_lists

    # uint8 image batches (decoded to [0,1] on device — deployment input
    # format), pre-staged in HBM while the relay link is still in its fast
    # pre-transition upload mode — the stand-in for a deployment host's
    # local NIC feed (the tunnel's post-readback 40MB/s is a harness
    # artifact; see PERF.md "environment bottleneck")
    n_staged = 5
    if model_file:
        # trained-weights mode: feed the training distribution (synthetic
        # rectangles) so corner/detection densities are the trained model's
        # real operating point — random noise would find ~zero corners
        from denet_tpu.data.synthetic import make_uint8_batch
        staged = [jnp.asarray(make_uint8_batch(rng, batch, size,
                                               model.class_num)[0])
                  for _ in range(n_staged)]
    else:
        staged = [jnp.asarray(rng.randint(0, 256, (batch, 3, size, size))
                              .astype(numpy.uint8)) for _ in range(n_staged)]

    if not model_file:
        calibrate_corner_bias_device(model, staged[0])

    # compile the fused pipeline and the result-drain stacker up front.
    # DENET_BENCH_INT8=1 serves through the int8 PTQ trunk (serve/quant.py):
    # int8 activations halve the HBM bytes of the bandwidth-bound trunk and
    # run the MXU at its 2x int8 rate; mAP cost measured by
    # scripts/eval_flagship_synth.py --int8
    use_int8 = os.environ.get("DENET_BENCH_INT8", "0") == "1"
    if use_int8:
        from denet_tpu.data.synthetic import make_uint8_batch
        from denet_tpu.serve import quant as quant_mod

        crng = numpy.random.RandomState(77)
        calib = [make_uint8_batch(crng, batch, size, model.class_num)[0]
                 for _ in range(4)]
        plan, qparams = quant_mod.quantize(model, calib)
        qfn = quant_mod.build_quant_detect_fn(
            model, detect_layer, plan, 0.01, 0.5, corner_k=256, top_m=128,
            top_n=100)

        def fn(p, s, x):
            return qfn(qparams, p, s, x)
    else:
        fn = _keepalive(model.build_full_detect_fn(
            detect_layer, 0.01, 0.5, corner_k=256, top_m=128, top_n=100))
    iters = int(os.environ.get("DENET_BENCH_ITERS", 40))

    # drain ONLY the detection arrays: dets_to_lists recovers per-image
    # counts from the +1.0 score sentinel, so the counts transfer (a second
    # ~10-30ms per-window device->host round trip on this link) is skipped
    def drain(dets_list):
        return jnp.stack(dets_list)

    drain_fn = _keepalive(jax.jit(drain))

    # pre-cast conv weights to bf16 once (after any calibration surgery):
    # removes per-step f32->bf16 weight converts from the fused pipeline
    params = model.inference_params()

    # warmup: run + drain once, then force the one-time d2h link transition
    # with the first host read — everything stays compiled + cached after
    rs = [fn(params, model.state, staged[i % n_staged])
          for i in range(2)]
    d = drain_fn([r[0] for r in rs] * (iters // 2))
    numpy.asarray(d[0, 0, 0])   # first d2h read: one-time link transition
    numpy.asarray(fn(params, model.state, staged[0])[1][0])

    # timed: full pipeline per batch, ALL detections materialized on host by
    # the end of the window (single stacked download: ~770KB for 40 batches).
    # Early windows after process start under-read by up to 40%, improving
    # over the first ~4-6 windows before plateauing (relay steady-state
    # effects, measured round 5: a cold window read 435-630 img/s while
    # steady same-process windows read 723-925 — /tmp/ab_headline.log,
    # /tmp/ab_cornerdiff_skip.log, PERF.md measurement rules).  So settle
    # UNTIL STEADY — run untimed windows until one is within 3% of its
    # predecessor (at most 5) — then report the median of 3 timed windows.
    def window():
        t0 = time.time()
        rs = [fn(params, model.state, staged[i % n_staged])
              for i in range(iters)]
        dets = numpy.asarray(drain_fn([r[0] for r in rs]))
        results = []
        for i in range(iters):
            results += dets_to_lists(dets[i])
        assert len(results) == batch * iters
        return time.time() - t0

    prev = window()                           # settle (untimed)
    for _ in range(4):
        cur = window()
        if abs(prev - cur) / prev < 0.03:
            break
        prev = cur
    dts = sorted(window() for _ in range(3))
    dt = dts[1]                               # median window
    hz = batch * iters / dt

    print(json.dumps({"metric": "denet34_skip_detect_inference",
                      "value": round(hz, 2),
                      "unit": "images/sec",
                      "vs_baseline": round(hz / BASELINE_HZ, 3)}))


if __name__ == "__main__":
    sys.exit(main())
