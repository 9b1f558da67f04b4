"""Device-side detection rates for every baseline table row (BASELINE.md).

Measures the steady-state rate of the fused on-device detection pipeline
(trunk + corner head + corner search + sparse gather + detect head + NMS,
one jit) for each published model variant, batch 8, bfloat16 trunk compute.
The timed loop never reads device->host (block_until_ready only), so this
is the per-chip rate a deployment with on-device consumers (or a sane
PCIe/ICI link) sustains — the axon tunnel RTT/bandwidth is a harness
artifact measured separately in PERF.md.

Heads are perturbed to a trained-like operating point (calibrated ~64
corners/type/image, null-dominant classifier) exactly as in bench.py.

Appends one JSON line per variant to the --out file as it completes, so a
partial run still yields data (remote compiles take minutes per variant).
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys
import time

import numpy


VARIANTS = [
    # (tag, family, variant, v2, size, sample_num_override, baseline_hz)
    ("denet34_skip_v1", 34, "skip", False, 512, None, 82.0),
    ("denet34_wide_v1", 34, "wide", False, 512, None, 44.0),
    ("denet101_skip_v1", 101, "skip", False, 512, None, 33.0),
    ("denet101_wide_v1", 101, "wide", False, 512, None, 17.0),
    ("denet34_wide_v2", 34, "wide", True, 512, None, 80.0),
    ("denet101_wide_v2", 101, "wide", True, 512, None, 21.0),
    ("denet101_wide_x768_v2", 101, "wide", True, 768, 36, 11.0),
]


def build_model(family, variant, v2, size, sn_override, batch):
    from denet_tpu.core.model import Model
    from denet_tpu.models import zoo

    numpy.random.seed(1)
    desc = (zoo.denet34 if family == 34 else zoo.denet101)(variant, v2=v2)
    if sn_override is not None:
        import re
        desc = [re.sub(r"^(DNS\[\d+,)\d+", r"\g<1>%d" % sn_override, t)
                if t.startswith("DNS[") else t for t in desc]
    model = Model()
    model.batch_size = batch
    model.class_num = 80
    model.class_labels = {str(i): i for i in range(80)}
    model.build(desc, (3, size, size), activation="relu",
                border_mode="half", weight_init=["he-forward"])
    return model


def run_variant(tag, family, variant, v2, size, sn_override, baseline_hz,
                batch=8, min_seconds=8.0, cluster_cap=None,
                models_dir=None, cap_policy="opt"):
    import jax
    import jax.numpy as jnp
    from bench import perturb_heads_host, calibrate_corner_bias_device

    ckpt = None
    if models_dir:
        import os
        cand = os.path.join(models_dir, tag + ".mdl.gz")
        if os.path.exists(cand):
            ckpt = cand
    if ckpt is not None:
        # trained weights: realistic corner densities + NMS load (round-2
        # batch-sweep inversion showed head calibration distorts these)
        import denet_tpu.core.model as model_mod
        model = model_mod.load_from_file(ckpt, batch_size=batch)
        model.compute_dtype = jnp.bfloat16
        detect_layer = model.layers[-1]
        model.ensure_on_device()
        # feed the training distribution: realistic corner/NMS load (noise
        # into a trained net detects ~nothing — unrealistically light).
        # Pre-stage 12 batches (96 images, the eval-set size) and ROTATE
        # them through the timed window: a single repeated batch makes the
        # whole row hostage to one draw's crowding (the round-4 sweep's
        # wide34_v2 row calibrated to cap 4096 off one 1683-candidate
        # image vs the 96-image distribution max of ~706), and cap
        # calibration over the same 12 batches is then representative of
        # the distribution rather than of one batch.
        from denet_tpu.data.synthetic import make_uint8_batch_hard
        rng = numpy.random.RandomState(3)
        xs = [jnp.asarray(make_uint8_batch_hard(rng, batch, size,
                                                model.class_num)[0])
              for _ in range(12)]
        x = xs[0]
    else:
        model = build_model(family, variant, v2, size, sn_override, batch)
        model.compute_dtype = jnp.bfloat16
        detect_layer = model.layers[-1]
        perturb_heads_host(model)
        model.ensure_on_device()

        rng = numpy.random.RandomState(3)
        x = jnp.asarray(rng.randint(0, 256, (batch, 3, size, size))
                        .astype(numpy.uint8))
        xs = [x]
        calibrate_corner_bias_device(model, x)

    calibrated = None
    sat = [False] * len(xs)
    ref_cap = 10 * detect_layer.sparse_layer.sample_num ** 2
    if (cluster_cap is None and v2
            and detect_layer.sparse_layer.nms_threshold < 1.0):
        # serving default for v2 rows: calibrate the cluster cap on the
        # input distribution (Model.calibrate_cluster_cap; any cap >= the
        # observed candidate count is bitwise lossless, and serving via
        # get_detections escalates saturated batches to the reference cap).
        # policy "opt" picks the expected-cost argmin over the measured
        # per-batch count distribution: rare crowded batches escalate
        # instead of taxing every batch with their quadratic adjacency.
        cap, max_count = model.calibrate_cluster_cap(detect_layer, xs,
                                                     policy=cap_policy)
        maxima = model.cluster_cap_stats["batch_maxima"]
        # same rule the serving guards apply (count >= cap -> escalate,
        # and NO escalation at the reference cap — the guard is
        # cluster_cap < ref_cap, so a ref-cap row never double-runs)
        sat = [cap < ref_cap and m >= cap for m in maxima]
        calibrated = {"cluster_cap": cap, "cand_max": max_count,
                      "cap_policy": cap_policy,
                      "escalated_batches": "%d/%d" % (sum(sat), len(sat))}
        print("%s: calibrated cluster cap %d policy=%s (observed max %d, "
              "%d/%d batches escalate)" % (tag, cap, cap_policy, max_count,
                                           sum(sat), len(sat)), flush=True)
    elif (cluster_cap is not None and v2
            and detect_layer.sparse_layer.nms_threshold < 1.0):
        # explicit --cluster-cap rows stay serving-honest (ADVICE r4):
        # measure per-batch candidate maxima with the same counting jit and
        # apply the escalation emulation real serving would — an explicit
        # cap must not skip the re-runs saturated batches cost
        _, max_count = model.calibrate_cluster_cap(detect_layer, xs,
                                                   policy=cap_policy)
        maxima = model.cluster_cap_stats["batch_maxima"]
        sat = [cluster_cap < ref_cap and m >= cluster_cap for m in maxima]
        calibrated = {"cluster_cap": cluster_cap, "cand_max": max_count,
                      "cap_policy": "explicit",
                      "escalated_batches": "%d/%d" % (sum(sat), len(sat))}
        print("%s: explicit cluster cap %d (observed max %d, %d/%d batches "
              "escalate)" % (tag, cluster_cap, max_count, sum(sat),
                             len(sat)), flush=True)
    kw = {} if cluster_cap is None else {"cluster_cap": cluster_cap}
    fn = model.build_full_detect_fn(detect_layer, 0.01, 0.5,
                                    corner_k=256, top_m=128, top_n=100, **kw)
    params = model.inference_params()   # pre-cast bf16 conv weights
    t_c0 = time.time()
    r = fn(params, model.state, x)
    jax.block_until_ready(r)
    compile_s = time.time() - t_c0
    # under the axon relay block_until_ready does NOT force remote
    # execution — only a device->host read does.  Pay the one-time d2h
    # link transition here, outside every timed window.
    numpy.asarray(r[1])
    fn_esc = None
    if any(sat):
        # escalation fn at the reference cap, compiled + warmed outside the
        # timed window (serving builds it lazily once and keeps it alive)
        fn_esc = model.build_full_detect_fn(
            detect_layer, 0.01, 0.5, corner_k=256, top_m=128, top_n=100,
            cluster_cap=ref_cap)
        numpy.asarray(fn_esc(params, model.state, x)[1])

    def timed(iters):
        # serving-honest escalation emulation: every batch runs the default
        # fn; batches the guard would escalate (count >= cap — known here
        # from calibration, read per-batch in real serving) ALSO run the
        # reference-cap fn, exactly the compute the dynamic path executes.
        t0 = time.time()
        for i in range(iters):
            j = i % len(xs)
            r = fn(params, model.state, xs[j])
            if sat[j]:
                r = fn_esc(params, model.state, xs[j])
        numpy.asarray(r[1][0])   # scalar-ish read: drains the exec queue
        return time.time() - t0

    timed(2)                      # settle
    step = max(timed(4) / 4, 1e-4)
    # cap queue depth: deep async queues behave pathologically on the relay
    iters = max(8, min(int(min_seconds / step), 512))
    dt = timed(iters)
    hz = batch * iters / dt
    res = {"metric": tag, "value": round(hz, 2), "unit": "images/sec",
           "vs_baseline": round(hz / baseline_hz, 3),
           "compile_s": round(compile_s, 1), "iters": iters}
    if calibrated is not None:
        res.update(calibrated)
    return res


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("bench_variants",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/variant_rates.jsonl")
    p.add_argument("--only", default=None,
                   help="comma-separated variant tags to run")
    p.add_argument("--cluster-cap", type=int, default=None,
                   help="candidate cap for v2 device corner clustering")
    p.add_argument("--models-dir", default=None,
                   help="directory of trained checkpoints named <tag>.mdl.gz;"
                        " a variant with a checkpoint benches those weights "
                        "on training-distribution inputs instead of the "
                        "perturbed-head calibration")
    p.add_argument("--batch", type=int, default=8,
                   help="serving batch size (throughput-vs-batch probes; "
                        "baseline comparisons use the reference's b8)")
    p.add_argument("--cap-policy", default="opt", choices=["opt", "max"],
                   help="v2 cluster-cap calibration policy: 'opt' = "
                        "expected-cost argmin with per-batch escalation "
                        "(serving default), 'max' = pessimistic "
                        "next-pow2(margin*max)")
    args = p.parse_args(argv)

    import os
    os.environ.setdefault("DENET_TPU_S2D_STEM", "1")  # see PERF.md
    import denet_tpu.utils.logging as logging
    logging.init(level="warning")

    from denet_tpu.utils import chiplock
    only = set(args.only.split(",")) if args.only else None
    for row in VARIANTS:
        if only and row[0] not in only:
            continue
        chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
        try:
            # a row is minutes of chip work (compile + calibration + timed
            # windows); mark it busy so an arriving bench.py waits for the
            # row boundary instead of timing against it
            with chiplock.queue_busy():
                res = run_variant(*row, cluster_cap=args.cluster_cap,
                                  models_dir=args.models_dir,
                                  batch=args.batch,
                                  cap_policy=args.cap_policy)
            if args.cluster_cap is not None:
                res["cluster_cap"] = args.cluster_cap
            if args.batch != 8:
                res["batch"] = args.batch
            if args.models_dir:
                import os as _o
                res["weights"] = ("trained" if _o.path.exists(_o.path.join(
                    args.models_dir, row[0] + ".mdl.gz")) else "calibrated")
        except Exception as e:  # noqa: BLE001 — record and continue
            res = {"metric": row[0], "error": repr(e)[:300]}
        line = json.dumps(res)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
