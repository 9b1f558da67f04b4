"""Candidate-cap study for the fused v2 device clustering (wide_v2 rows).

The trained-weights sweep put denet34_wide_v2 at 281.6 img/s (3.5x) — the
weakest row — with device clustering at the default cap 5760 (=10*576, the
reference's host admission, denet_sparse.cc:377).  The N^2 adjacency +
label-propagation cost scales quadratically in the cap, but the cap only
admits the top-pr candidate TAIL: if the trained model emits far fewer
candidates than 5760 on realistic inputs, a lower cap is lossless.

This probe, on the real chip with the TRAINED checkpoint:
  1. measures the actual candidate-count distribution (corner search
     output before clustering) over held-out hard-distribution images,
  2. times the full fused pipeline at a ladder of caps (interleaved
     windows — same-process A/B per PERF.md methodology),
  3. scores held-out COCO/VOC mAP at each cap (seed-1234 protocol).

Run: python -u scripts/probe_cluster_cap.py [--caps 5760,2048,1024]
"""
import argparse
import json
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("probe_cluster_cap",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="models/variants/denet34_wide_v2.mdl.gz")
    p.add_argument("--caps", default="5760,3072,2048,1536,1024")
    p.add_argument("--count-batches", type=int, default=12)
    p.add_argument("--eval-batches", type=int, default=12)
    p.add_argument("--windows", type=int, default=6)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--skip-eval", action="store_true")
    args = p.parse_args(argv)
    caps = [int(c) for c in args.caps.split(",")]

    import jax
    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.core.model import _keepalive
    from denet_tpu.data.synthetic import make_batch_hard
    from denet_tpu.layers.base import Ctx
    from denet_tpu.ops.corner_search_device import corner_search
    from eval_flagship_synth import run_eval

    logging.init(level="warning")
    batch = 8
    model = model_mod.load_from_file(args.model, batch_size=batch)
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]
    sparse = detect_layer.sparse_layer
    size = model.data_shape[1]
    sn = sparse.sample_num
    model.ensure_on_device()
    params = model.inference_params()

    # -- 1. candidate counts before clustering ------------------------------
    corner_index = sparse.corner_layer.layer_index
    cap0 = min(10 * sn * sn, max(caps))

    def count_fn(params, state, x):
        ctx = Ctx(train=False, compute_dtype=model.compute_dtype)
        outputs = {0: model.prep_input(x, ctx)}
        for i in range(1, corner_index + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        c = ctx.collect[corner_index]
        diff = c["corner_pr"][:, 0] - c["corner_pr"][:, 1]
        _bb, _pr, cnt = corner_search(diff, sparse.corner_threshold, sn,
                                      out_count=cap0,
                                      local_max=sparse.local_max)
        return cnt

    cfn = _keepalive(jax.jit(count_fn))
    rng = numpy.random.RandomState(1234)
    counts = []
    for _ in range(args.count_batches):
        xs, _metas = make_batch_hard(rng, batch, size, model.class_num)
        counts += numpy.asarray(
            cfn(params, model.state, jnp.asarray(xs))).tolist()
    counts = numpy.asarray(counts)
    print(json.dumps({
        "probe": "candidate_counts", "model": args.model, "cap0": cap0,
        "n_images": int(counts.size), "mean": float(counts.mean()),
        "p50": int(numpy.percentile(counts, 50)),
        "p90": int(numpy.percentile(counts, 90)),
        "p99": int(numpy.percentile(counts, 99)),
        "max": int(counts.max())}), flush=True)

    # -- 2. fused-pipeline timing at each cap (interleaved windows) ---------
    rngx = numpy.random.RandomState(3)
    from denet_tpu.data.synthetic import make_uint8_batch_hard
    x_dev = jnp.asarray(make_uint8_batch_hard(rngx, batch, size,
                                              model.class_num)[0])
    fns = {}
    for cap in caps:
        fns[cap] = model.build_full_detect_fn(detect_layer, 0.01, 0.5,
                                              cluster_cap=cap)
        r = fns[cap](params, model.state, x_dev)
        numpy.asarray(r[1])[:1]          # warm + drain outside windows
    from denet_tpu.utils import chiplock
    acc = {cap: 0.0 for cap in caps}
    for _w in range(args.windows):
        chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
        for cap in caps:
            t0 = time.time()
            for _ in range(args.iters):
                r = fns[cap](params, model.state, x_dev)
            numpy.asarray(r[1][0])
            acc[cap] += time.time() - t0
    for cap in caps:
        dt = acc[cap] / (args.windows * args.iters)
        print(json.dumps({"probe": "fused_rate", "cap": cap,
                          "ms_per_batch": round(1000 * dt, 2),
                          "img_per_s": round(batch / dt, 1)}), flush=True)

    # -- 3. held-out mAP at each cap ----------------------------------------
    if args.skip_eval:
        return 0
    for cap in caps:
        erng = numpy.random.RandomState(1234)
        dets = []
        for _ in range(args.eval_batches):
            xs, metas = make_batch_hard(erng, batch, size, model.class_num)
            dets += detect_layer.get_detections(
                model, xs, metas, {"prThreshold": 0.05, "nmsThreshold": 0.5,
                                   "clusterCap": cap})
        run_eval(model, dets, size, tag="cap%d " % cap)
    return 0


if __name__ == "__main__":
    sys.exit(main())
