"""Same-process interleaved A/B of the two serving-bench protocols.

Round-5 context: the round-4 driver bench read 481 img/s and a clean
round-5 idle-chip run read 435-630, while bench_variants measured the same
architecture at 943 img/s the same day.  This script separates protocol
overhead from chip state by timing BOTH protocols on the SAME fused fn in
one process, interleaved and repeated (PERF.md measurement rules):

  A  bench.py headline: iters async dispatches, then one jitted stack of
     all results + full detections download (materialize-everything)
  B  bench_variants: iters async dispatches, then a tiny r[1][0] read
     (drain only)
  C  block-per-batch: read r[1][0] every batch (upper bound on dispatch
     round-trip cost)

Usage: python -u scripts/ab_headline.py [--iters 40] [--reps 3]
"""
import argparse
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    with chiplock.chip_lease("ab_headline",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--model", default="models/denet34_skip_synth512.mdl.gz")
    args = p.parse_args(argv)

    os.environ.setdefault("DENET_TPU_S2D_STEM", "1")
    import jax
    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.core.model import _keepalive
    from denet_tpu.data.synthetic import make_uint8_batch
    from denet_tpu.ops.nms_device import dets_to_lists

    logging.init(level="warning")
    batch, size = 8, 512
    model = model_mod.load_from_file(args.model, batch_size=batch)
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]
    model.ensure_on_device()

    rng = numpy.random.RandomState(3)
    staged = [jnp.asarray(make_uint8_batch(rng, batch, size,
                                           model.class_num)[0])
              for _ in range(5)]

    fn = _keepalive(model.build_full_detect_fn(
        detect_layer, 0.01, 0.5, corner_k=256, top_m=128, top_n=100))
    drain_fn = _keepalive(jax.jit(lambda ds: jnp.stack(ds)))
    params = model.inference_params()

    it = args.iters

    # warmup both drains + the one-time link transition
    rs = [fn(params, model.state, staged[i % 5]) for i in range(2)]
    d = drain_fn([r[0] for r in rs] * (it // 2))
    numpy.asarray(d[0, 0, 0])
    numpy.asarray(fn(params, model.state, staged[0])[1][0])

    def proto_a():
        t0 = time.time()
        rs = [fn(params, model.state, staged[i % 5]) for i in range(it)]
        dets = numpy.asarray(drain_fn([r[0] for r in rs]))
        n = 0
        for i in range(it):
            n += len(dets_to_lists(dets[i]))
        assert n == batch * it
        return time.time() - t0

    def proto_b():
        t0 = time.time()
        for i in range(it):
            r = fn(params, model.state, staged[i % 5])
        numpy.asarray(r[1][0])
        return time.time() - t0

    def proto_c():
        t0 = time.time()
        for i in range(it):
            r = fn(params, model.state, staged[i % 5])
            numpy.asarray(r[1][0])
        return time.time() - t0

    protos = [("A stacked-drain", proto_a), ("B tiny-read", proto_b),
              ("C block-per-batch", proto_c)]
    for name, f in protos:       # settle each once outside the record
        f()
    for rep in range(args.reps):
        for name, f in protos:
            dt = f()
            print("rep %d  %-18s %7.1f img/s  (%6.2f ms/batch)" % (
                rep, name, batch * it / dt, 1000 * dt / it), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
