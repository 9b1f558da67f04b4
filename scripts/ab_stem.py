"""Same-process interleaved A/B of stem variants (round-5 VERDICT item 4).

The round-5 HLO cycle audit (scripts/analyze_hlo.py on wide34_v2, cap 2304)
ranked layout copies at 27.3% of estimated cycles, dominated by the S2D
stem's block transpose running in bf16 (XLA hoists the u8 decode above the
transpose, doubling the copied bytes).  Arms, each a separately built+traced
fused detect fn on the SAME staged u8 batches:

  A  S2D stem on, no barrier       (shipping default before this round)
  B  S2D stem off                  (plain 7x7 stride-2 conv)
  C  S2D stem on + u8 barrier      (optimization_barrier pins the block
                                    transpose to 1-byte elements)

Protocol: bench_variants tiny-read drain (iters async dispatches + one
r[1][0] read), settle pass per arm, then reps interleaved rounds.

Usage: python -u scripts/ab_stem.py [--iters 40] [--reps 3]
       [--model models/variants/denet34_wide_v2c.mdl.gz] [--cap 2304]
"""
import argparse
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    with chiplock.chip_lease("ab_stem", log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--model",
                   default="models/variants/denet34_wide_v2c.mdl.gz")
    p.add_argument("--cap", type=int, default=0,
                   help="cluster cap (0 = calibrate opt policy)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.core.model import _keepalive
    from denet_tpu.data.synthetic import make_uint8_batch

    logging.init(level="warning")
    batch, size = 8, 512
    model = model_mod.load_from_file(args.model, batch_size=batch)
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]
    use_v2 = detect_layer.sparse_layer.nms_threshold < 1.0
    model.ensure_on_device()

    rng = numpy.random.RandomState(3)
    staged = [jnp.asarray(make_uint8_batch(rng, batch, size,
                                           model.class_num)[0])
              for _ in range(5)]

    kw = dict(corner_k=256, top_m=128, top_n=100)
    if use_v2:
        cap = args.cap
        if not cap:
            model.calibrate_cluster_cap(detect_layer, staged, policy="opt")
            cap = model.cluster_cap
        kw["cluster_cap"] = cap
        print("cluster_cap %d" % cap, flush=True)

    ARMS = [("A s2d",         {"DENET_TPU_S2D_STEM": "1",
                               "DENET_TPU_S2D_BARRIER": "0"}),
            ("B no-s2d",      {"DENET_TPU_S2D_STEM": "0",
                               "DENET_TPU_S2D_BARRIER": "0"}),
            ("C s2d+barrier", {"DENET_TPU_S2D_STEM": "1",
                               "DENET_TPU_S2D_BARRIER": "1"})]

    params = model.inference_params()
    fns = []
    for name, env in ARMS:
        os.environ.update(env)
        fn = _keepalive(model.build_full_detect_fn(
            detect_layer, 0.01, 0.5, **kw))
        t0 = time.time()
        r = fn(params, model.state, staged[0])      # trace+compile now
        numpy.asarray(r[1][0])
        print("%-14s compiled in %.1f s" % (name, time.time() - t0),
              flush=True)
        fns.append((name, fn))

    # parity check: same detections from every arm (bf16 reassociation only)
    ref = numpy.asarray(fns[0][1](params, model.state, staged[1])[0])
    for name, fn in fns[1:]:
        got = numpy.asarray(fn(params, model.state, staged[1])[0])
        dmax = numpy.abs(ref - got).max()
        print("%-14s max |delta dets| vs A: %.4g" % (name, dmax), flush=True)

    it = args.iters

    def run(fn):
        t0 = time.time()
        for i in range(it):
            r = fn(params, model.state, staged[i % 5])
        numpy.asarray(r[1][0])
        return time.time() - t0

    for _, fn in fns:               # settle pass (first windows polluted)
        run(fn)
    for rep in range(args.reps):
        for name, fn in fns:
            dt = run(fn)
            print("rep %d  %-14s %7.1f img/s  (%6.2f ms/batch)" % (
                rep, name, batch * it / dt, 1000 * dt / it), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
