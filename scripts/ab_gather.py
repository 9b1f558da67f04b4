"""Same-process A/B: RoI-gather lowering (round-5 HLO-audit lever 2).

The shipped gather transposes the whole sample feature map NCHW->NHWC
into a (B*H*W, F) table before one flat take (~9.6% of the wide model's
ESTIMATED cycles, sparse_gather.py).  The "nchw" arm keeps NCHW,
take_along_axis's the flattened spatial axis, and transposes only the
gathered result.  Results are bitwise-identical (test_detection.py);
this measures wall clock inside the full fused detect fn:

  A  flat   DENET_TPU_GATHER=flat (shipping default)
  B  nchw   DENET_TPU_GATHER=nchw

Usage: python -u scripts/ab_gather.py [--iters 40] [--reps 3]
       [--model ...] [--cap N]
"""
import argparse
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    with chiplock.chip_lease("ab_gather",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--model",
                   default="models/variants/denet34_wide_v2c.mdl.gz")
    p.add_argument("--cap", type=int, default=0)
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

    ARMS = [("A flat", {"DENET_TPU_GATHER": "flat"}),
            ("B nchw", {"DENET_TPU_GATHER": "nchw"})]

    params = model.inference_params()
    fns = []
    for name, env in ARMS:
        os.environ.update(env)
        fn = _keepalive(model.build_full_detect_fn(
            detect_layer, 0.01, 0.5, **kw))
        t0 = time.time()
        r = fn(params, model.state, staged[0])
        numpy.asarray(r[1][0])
        print("%-15s compiled in %.1f s" % (name, time.time() - t0),
              flush=True)
        fns.append((name, fn))
    os.environ.pop("DENET_TPU_GATHER", None)

    ref = numpy.asarray(fns[0][1](params, model.state, staged[1])[0])
    got = numpy.asarray(fns[1][1](params, model.state, staged[1])[0])
    print("max |delta dets| A vs B: %.4g" % numpy.abs(ref - got).max(),
          flush=True)

    it = args.iters

    def run(fn):
        t0 = time.time()
        for i in range(it):
            r = fn(params, model.state, staged[i % 5])
        numpy.asarray(r[1][0])
        return time.time() - t0

    for _, fn in fns:
        run(fn)
    for rep in range(args.reps):
        for name, fn in fns:
            dt = run(fn)
            print("rep %d  %-15s %7.1f img/s  (%6.2f ms/batch)" % (
                rep, name, batch * it / dt, 1000 * dt / it), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
