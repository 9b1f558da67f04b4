"""Training throughput: DeNet34-skip @512, batch 8, full train step.

Measures steady-state images/sec of the complete training loop — host
target generation (corner heatmaps, device-search sample selection, IoU
detect matching), forward+backward+solver update as one jit, bfloat16
trunk compute — with pipelined target preparation (one-step-stale sample
selection, reference denet_sparse.py:164-206 semantics).

Two numbers are reported to stdout (one JSON line each):
  * device_step: img/s of the jitted step alone (block per step, no host
    target work in the window) — the chip-bound rate.
  * train_loop: img/s of the pipelined loop including host target prep —
    the deployable end-to-end rate on this harness.

The reference publishes no training-rate baseline (BASELINE.md), so
vs_baseline is reported against its own device_step (ratio of loop
efficiency) for the loop line and 1.0 for the device line.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys
import time

import numpy


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("bench_train",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--device-targets", type=int, default=1,
                   help="1 = fused on-device sample selection + target "
                        "construction (ops/target_device); 0 = host path")
    p.add_argument("--sections", default="base",
                   choices=("base", "scan", "all"),
                   help="base: device step + pipelined loops; scan: the "
                        "scan-K dispatch mode (own process — each remote "
                        "XLA compile costs minutes, 4+ don't fit one 590s "
                        "window)")
    args = p.parse_args(argv)
    import jax.numpy as jnp

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model
    from denet_tpu.train.trainer import Trainer

    logging.init(level="warning")

    import os
    from denet_tpu.utils import chiplock
    chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
    batch, size = args.batch, args.size
    model = _build_detect_model(batch, size, class_num=80, variant="skip")
    model.compute_dtype = jnp.bfloat16
    if os.environ.get("DENET_BENCH_NO_REMAT", "0") == "1":
        # split-mode remat trades recompute for memory (reference split
        # execution); disable to measure the recompute cost when the model
        # fits in HBM without it
        model.use_split_mode = False
    rng = numpy.random.RandomState(3)
    if args.sections == "scan":
        from denet_tpu.data.synthetic_device import (make_gt_batch,
                                                     make_render_fn)
        render = make_render_fn(batch, size, 80, 5)
        geos = []
        for _ in range(args.iters):
            metas, boxes, classes, counts = make_gt_batch(rng, batch, size,
                                                          80)
            geos.append(((boxes, classes, counts), metas))
        K = 8
        return _scan_section(args, model, render, geos, K, args.iters, None)

    trainer = Trainer(model, solver_mode="nesterov", seed=1,
                      pipeline_targets=True,
                      device_targets=bool(args.device_targets))

    def make_batch(it):
        x = rng.uniform(0, 1, (batch, 3, size, size)).astype(numpy.float32)
        metas = []
        for _ in range(batch):
            n = rng.randint(1, 8)
            x0 = rng.uniform(0, 0.7, n)
            y0 = rng.uniform(0, 0.7, n)
            w = rng.uniform(0.05, 0.3, n)
            h = rng.uniform(0.05, 0.3, n)
            metas.append({"bbox": list(zip(x0, y0, x0 + w, y0 + h)),
                          "class": rng.randint(0, 80, n).tolist()})
        return x, metas

    import jax.numpy as jnp

    # stage every batch in HBM BEFORE the first device->host read: the relay
    # link's upload bandwidth permanently degrades ~30x after any read (the
    # deployment stand-in is a local host feed; see PERF.md).  Distinct
    # batches so BN/solver see realistic data.
    batches = [make_batch(i) for i in range(args.iters)]
    xs_dev = [jnp.asarray(b[0]) for b in batches]
    x, metas = batches[0][0], batches[0][1]
    x_dev = xs_dev[0]

    # warmup: compile step + corner/sample fns, settle BN stats; the
    # float() cost reads also pay the one-time axon d2h link transition
    # (block_until_ready does NOT force remote execution — only reads do)
    for it in range(2):
        trainer.train_step(x_dev, metas, 0, it, 0.01, [0.9, 0.999], 1e-4)

    # re-check the bench lock at EVERY timed-window boundary (not just
    # startup) — a bench launched mid-run must not collide with a window
    # (ADVICE round 3; matches probe_cluster_cap / bench_variants)
    _yield = lambda: chiplock.yield_to_bench(log=lambda m: print(m,
                                                                 flush=True))

    # --- device step rate: pre-prepared targets, pre-staged inputs ---------
    prepared = trainer.prepare_targets(x_dev, metas)
    iters = args.iters
    _yield()
    t0 = time.time()
    for it in range(iters):
        total, costs = trainer.train_step(
            x_dev, metas, 0, 2 + it, 0.01, [0.9, 0.999], 1e-4,
            prepared=prepared, block=False)
    float(total)   # scalar read: drains the device exec queue
    dt = time.time() - t0
    dev_hz = batch * iters / dt
    print(json.dumps({"metric": "denet34_skip_train_device_step",
                      "value": round(dev_hz, 2), "unit": "images/sec",
                      "vs_baseline": 1.0}), flush=True)

    # --- pipelined loop: host target prep overlapped with device step,
    # cost scalars read in blocks of K as ONE stacked transfer (the
    # production _train_epoch_pipelined protocol; per-step reads serialize
    # the loop on the relay — PERF.md round 2)
    import jax.numpy as jnpp
    K = trainer.cost_read_interval
    iters = args.iters
    # warm the stacked-read shapes OUTSIDE the window (each new stack width
    # is a fresh — slow, remote — XLA compile on this harness)
    numpy.asarray(jnpp.stack([total] * K))
    if iters % K:
        numpy.asarray(jnpp.stack([total] * (iters % K)))
    _yield()
    t0 = time.time()
    pending = []
    prep = trainer.prepare_targets(xs_dev[0], batches[0][1])
    for i in range(iters):
        fut = trainer.train_step(xs_dev[i], batches[i][1], 0, 22 + i,
                                 0.01, [0.9, 0.999], 1e-4,
                                 prepared=prep, block=False)
        if i + 1 < iters:
            prep = trainer.prepare_targets(xs_dev[i + 1], batches[i + 1][1])
        pending.append(fut[0])
        if len(pending) >= K:
            numpy.asarray(jnpp.stack(pending))   # one read per K steps
            pending = []
    if pending:
        numpy.asarray(jnpp.stack(pending))
    dt = time.time() - t0
    loop_hz = batch * iters / dt
    print(json.dumps({"metric": "denet34_skip_train_loop",
                      "value": round(loop_hz, 2), "unit": "images/sec",
                      "vs_baseline": round(loop_hz / dev_hz, 3)}), flush=True)

    # --- device-data loop: geometry-only uploads, the image rasterized
    # INSIDE the step jit (Trainer input_fn tracing synthetic_device's
    # renderer) — the round-3 fused protocol of train_flagship_synth.
    # Round 2 paid ~2 extra dispatches/step for a separate render jit.
    if args.device_targets:
        from denet_tpu.data.synthetic_device import (make_gt_batch,
                                                     make_render_fn)
        render = make_render_fn(batch, size, 80, 5)
        trainer2 = Trainer(model, solver_mode="nesterov", seed=1,
                           pipeline_targets=True, device_targets=True,
                           input_fn=lambda key, g: render(key, *g))
        geos = []
        for _ in range(args.iters):
            metas, boxes, classes, counts = make_gt_batch(rng, batch, size,
                                                          80)
            geos.append(((boxes, classes, counts), metas))
        for it in range(2):     # compile the fused render+step
            trainer2.train_step(geos[0][0], geos[0][1], 0, it, 0.01,
                                [0.9, 0.999], 1e-4)

        # compute-matched step rate: same fused render+train jit, targets
        # pre-prepared and geometry pre-staged, so the gap between this and
        # the loop below is pure host/dispatch overhead (the render compute
        # itself is part of both)
        prep = trainer2.prepare_targets(None, geos[0][1])
        _yield()
        t0 = time.time()
        for it in range(iters):
            total, _ = trainer2.train_step(
                geos[0][0], geos[0][1], 0, 2 + it, 0.01, [0.9, 0.999], 1e-4,
                prepared=prep, block=False)
        float(total)
        dt = time.time() - t0
        dd_dev_hz = batch * iters / dt
        print(json.dumps({"metric": "denet34_skip_train_device_step_fused_render",
                          "value": round(dd_dev_hz, 2), "unit": "images/sec",
                          "vs_baseline": round(dd_dev_hz / dev_hz, 3)}),
              flush=True)
        _yield()
        t0 = time.time()
        pending = []
        prep = trainer2.prepare_targets(None, geos[0][1])
        for i in range(iters):
            fut = trainer2.train_step(geos[i][0], geos[i][1], 0, 42 + i,
                                      0.01, [0.9, 0.999], 1e-4,
                                      prepared=prep, block=False)
            if i + 1 < iters:
                prep = trainer2.prepare_targets(None, geos[i + 1][1])
            pending.append(fut[0])
            if len(pending) >= K:
                numpy.asarray(jnpp.stack(pending))
                pending = []
        if pending:
            numpy.asarray(jnpp.stack(pending))
        dt = time.time() - t0
        dd_hz = batch * iters / dt
        print(json.dumps({"metric": "denet34_skip_train_loop_device_data",
                          "value": round(dd_hz, 2), "unit": "images/sec",
                          "vs_baseline": round(dd_hz / dev_hz, 3)}),
              flush=True)

        if args.sections == "all":
            _scan_section(args, model, render, geos, K, iters, dev_hz)


def _scan_section(args, model, render, geos, scan_k, iters, dev_hz):
    """Scan-K loop: K optimizer steps per dispatch (ONE jit running lax.scan
    over the step body; Trainer.train_steps).  Geometry for K batches
    uploads as one stacked transfer; the K cost scalars come back as one
    array — host dispatch amortizes K-fold."""
    import json
    import time

    import numpy

    from denet_tpu.train.trainer import Trainer
    from denet_tpu.utils import chiplock

    _yield = lambda: chiplock.yield_to_bench(log=lambda m: print(m,
                                                                 flush=True))
    batch = args.batch
    trainer3 = Trainer(model, solver_mode="nesterov", seed=1,
                       device_targets=True,
                       input_fn=lambda key, g: render(key, *g))
    chunks = [geos[i:i + scan_k]
              for i in range(0, len(geos), scan_k)
              if len(geos[i:i + scan_k]) == scan_k]
    trainer3.train_steps(chunks[0], 0, 0.01, [0.9, 0.999], 1e-4)  # compile
    if dev_hz is None:
        # standalone run: the compute-matched reference is the fused-render
        # per-step rate measured through the SAME trainer's step jit
        prep = trainer3.prepare_targets(None, chunks[0][0][1])
        # warmup MUST block: the float() read pays the one-time axon d2h
        # link transition outside the timed window (an unread warmup left
        # the first read inside the window — 6.6 img/s artifact)
        for it in range(2):
            trainer3.train_step(chunks[0][0][0], chunks[0][0][1], 0, it,
                                0.01, [0.9, 0.999], 1e-4, prepared=prep)
        _yield()
        t0 = time.time()
        for it in range(iters):
            total, _ = trainer3.train_step(
                chunks[0][0][0], chunks[0][0][1], 0, 2 + it, 0.01,
                [0.9, 0.999], 1e-4, prepared=prep, block=False)
        float(total)
        dev_hz = batch * iters / (time.time() - t0)
        print(json.dumps({"metric":
                          "denet34_skip_train_device_step_fused_render",
                          "value": round(dev_hz, 2), "unit": "images/sec",
                          "vs_baseline": 1.0}), flush=True)
    _yield()
    t0 = time.time()
    n_steps = 0
    while n_steps < iters:
        for ch in chunks:
            totals = trainer3.train_steps(ch, 0, 0.01, [0.9, 0.999], 1e-4)
            n_steps += scan_k
            if n_steps >= iters:
                break
    numpy.asarray(totals)    # drain
    dt = time.time() - t0
    sc_hz = batch * n_steps / dt
    print(json.dumps({"metric": "denet34_skip_train_loop_scan%d" % scan_k,
                      "value": round(sc_hz, 2), "unit": "images/sec",
                      "vs_baseline": round(sc_hz / dev_hz, 3)}),
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
