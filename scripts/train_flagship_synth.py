"""Train the bench flagship (DeNet34-skip @512, 80 classes) on synthetic
colored-rectangle data and save a checkpoint for trained-weights benching.

Purpose: bench.py's default protocol perturbs + bias-calibrates the
untrained heads to a trained-like operating point; loading a genuinely
trained checkpoint removes that synthetic calibration from the headline
(VERDICT round-1, item 9).  The data is synthetic (no datasets in this
image) but the heads end up with REAL trained statistics: corner
distributions concentrated on object corners, a dominant null class, and
calibrated detection scores.

Protocol notes (PERF.md environment gotchas):
  * a pool of batches is staged in HBM before the first device read so the
    hot loop never uploads through the degraded post-transition link;
  * fused device-target training (ops/target_device) — host ships only
    compact gt arrays per step;
  * one scalar read per step bounds the dispatch queue (deep async queues
    collapse throughput on this relay).

Usage:  python scripts/train_flagship_synth.py [--steps 3000] [--out F]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import math
import sys
import time

import numpy


from denet_tpu.data.synthetic import make_sample  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--class-num", type=int, default=80)
    p.add_argument("--pool", type=int, default=48,
                   help="HBM-staged batch pool size (cycled)")
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--out", default="models/denet34_skip_synth512.mdl.gz")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model
    from denet_tpu.train.trainer import Trainer

    logging.init(level="info")

    model = _build_detect_model(args.batch, args.size,
                                class_num=args.class_num, variant="skip")
    model.compute_dtype = jnp.bfloat16
    model.use_split_mode = False   # fits HBM; +28% step (PERF.md)
    trainer = Trainer(model, solver_mode="nesterov", seed=1,
                      pipeline_targets=True, device_targets=True)

    rng = numpy.random.RandomState(7)
    print("staging %d batches in HBM..." % args.pool, flush=True)
    pool = []
    for _ in range(args.pool):
        xs, metas = zip(*[make_sample(rng, args.size, args.class_num)
                          for _ in range(args.batch)])
        pool.append((jnp.asarray(numpy.stack(xs)), list(metas)))

    # 3-stage lr decay over the run (the reference recipes' shape)
    def lr_at(it):
        frac = it / max(1, args.steps)
        return args.lr * (0.1 ** int(frac * 3) if frac < 1 else 0.01)

    t0 = time.time()
    pending = None
    prep = trainer.prepare_targets(*pool[0])
    for it in range(args.steps):
        x_dev, metas = pool[it % args.pool]
        fut = trainer.train_step(x_dev, metas, 0, it, lr_at(it),
                                 [0.9, 0.999], 1e-4, prepared=prep,
                                 block=False)
        nxt = pool[(it + 1) % args.pool]
        prep = trainer.prepare_targets(nxt[0], nxt[1])
        if pending is not None:
            cost = float(pending[0])
            if not math.isfinite(cost):
                print("ABORT: non-finite cost at step %d" % (it - 1))
                return 1
            if (it - 1) % 200 == 0:
                dt = time.time() - t0
                print("step %5d  cost %.4f  (%.1f img/s)" % (
                    it - 1, cost, args.batch * it / dt), flush=True)
        pending = fut
    print("final cost %.4f" % float(pending[0]), flush=True)
    print("total %.1fs" % (time.time() - t0), flush=True)

    model_mod.save_to_file(model, args.out)
    print("saved %s" % args.out, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
