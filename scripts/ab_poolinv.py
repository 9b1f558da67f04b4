"""Same-process A/B: PoolInv lowering (round-5 HLO-audit last lever).

The train/serve HLO audit attributed ~4.1% of estimated wide-model cycles
to the PI upsample's broadcast; the shipped lowering is two sequential
``jnp.repeat`` calls (axis 2 then 3), which materializes a (b,c,h*s,w)
intermediate unless XLA fuses it.  Arm B lowers the whole upsample as ONE
(h,1,w,1)->(h,s,w,s) broadcast + reshape.

  A  repeat    DENET_TPU_POOLINV=repeat   (shipping default)
  B  combined  DENET_TPU_POOLINV=combined (single broadcast)

Element-identical by construction (tests/test_layers.py).  The stem-copy
lesson applies: an estimated-cycle term that overlaps MXU work reads as
free in wall clock — this measures whether the intermediate is real.

Usage: python -u scripts/ab_poolinv.py [--iters 40] [--reps 3]
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
    with chiplock.chip_lease("ab_poolinv",
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

    n_pi = sum(1 for l in model.layers if l.type_name == "pool-inv")
    print("pool-inv layers in model: %d" % n_pi, flush=True)

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

    ARMS = [("A repeat",   {"DENET_TPU_POOLINV": "repeat"}),
            ("B combined", {"DENET_TPU_POOLINV": "combined"})]

    params = model.inference_params()
    fns = []
    for name, env in ARMS:
        os.environ.update(env)
        fn = _keepalive(model.build_full_detect_fn(
            detect_layer, 0.01, 0.5, **kw))
        t0 = time.time()
        r = fn(params, model.state, staged[0])
        numpy.asarray(r[1][0])
        print("%-12s compiled in %.1f s" % (name, time.time() - t0),
              flush=True)
        fns.append((name, fn))

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
            print("rep %d  %-12s %7.1f img/s  (%6.2f ms/batch)" % (
                rep, name, batch * it / dt, 1000 * dt / it), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
