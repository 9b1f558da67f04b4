"""x768 stretch config with TRAINED weights (VERDICT round-2 item 8).

Reproduces the reference's hardest published recipe (README.md:140-148) on
the trained flagship: model-modify surgery to 768x768 input + 1296 RoIs
(sample_num 36), BN recalibration at the new resolution (model-update-bn
equivalent), then held-out hard-distribution mAP AND serving throughput at
768 — validating the surgery path end-to-end with real weights, not just
a throughput fixture.

Run on the TPU:  python -u scripts/x768_eval.py [--steps to retune]
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
    with chiplock.chip_lease("x768_eval",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="models/denet34_skip_synth512.mdl.gz")
    p.add_argument("--out", default="/tmp/denet34_skip_synth_x768.mdl.gz")
    p.add_argument("--size", type=int, default=768)
    p.add_argument("--sample-num", type=int, default=36)
    p.add_argument("--bn-batches", type=int, default=8)
    p.add_argument("--eval-batches", type=int, default=12)
    p.add_argument("--bench-iters", type=int, default=60)
    p.add_argument("--dist", choices=("easy", "hard"), default="hard")
    p.add_argument("--tag", default="denet34_skip_x768_trained",
                   help="metric label for the throughput JSON line")
    p.add_argument("--baseline-hz", type=float, default=11.0)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.apps import modify as modify_app
    from denet_tpu.apps.update_bn import compute_bn_stats
    from denet_tpu.data.synthetic import make_batch, make_batch_hard
    from eval_flagship_synth import run_eval

    logging.init(level="warning")

    # 1. the real CLI surgery path (reference README.md:144-145)
    modify_app.main(["--input", args.model, "--output", args.out,
                     "--image-size", str(args.size), str(args.size),
                     "--modify-layer", "denet-sparse",
                     "sample_num=%d" % args.sample_num])

    model = model_mod.load_from_file(args.out, batch_size=8)
    model.compute_dtype = jnp.bfloat16
    sparse = [l for l in model.layers if l.type_name == "denet-sparse"][0]
    assert sparse.sample_num == args.sample_num
    assert model.data_shape[1] == args.size
    model.ensure_on_device()

    gen = make_batch_hard if args.dist == "hard" else make_batch

    # 2. BN recalibration at the new resolution (update_bn equivalent)
    brng = numpy.random.RandomState(99)
    bn_x = numpy.concatenate(
        [gen(brng, 8, args.size, model.class_num)[0]
         for _ in range(args.bn_batches)], axis=0)
    from denet_tpu.utils import chiplock
    chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
    with chiplock.queue_busy():
        bn_layers, results = compute_bn_stats(model, bn_x, 8)
    for (layer, state), (mean, stdinv) in zip(bn_layers, results):
        state["mean"] = jnp.asarray(mean)
        state["stdinv"] = jnp.asarray(stdinv)
    model.invalidate_cached_params()
    model.ensure_on_device()
    # persist the recalibrated stats: --out was written by the surgery step
    # BEFORE recalibration, so without this save the shipped x768 checkpoint
    # would carry the stale 512-res BN stats (the exact failure the precise-
    # BN fix closed) while only the in-memory evals below were correct
    model_mod.save_to_file(model, args.out)
    print("recalibrated %d BN layers at %d (saved to %s)" % (
        len(bn_layers), args.size, args.out), flush=True)

    # 3. held-out mAP at 768 (hard distribution, seed 1234)
    detect_layer = model.layers[-1]
    erng = numpy.random.RandomState(1234)
    detections = []
    t0 = time.time()
    from denet_tpu.utils import chiplock
    for bi in range(args.eval_batches):
        chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
        xs, metas = gen(erng, 8, args.size, model.class_num)
        with chiplock.queue_busy():
            detections += detect_layer.get_detections(
                model, xs, metas, {"prThreshold": 0.05,
                                   "nmsThreshold": 0.5})
        print("eval batch %d/%d (%.0fs)" % (bi + 1, args.eval_batches,
                                            time.time() - t0), flush=True)
    run_eval(model, detections, args.size, tag="x768 ")

    # 4. serving throughput at 768 (pre-staged inputs, pipelined drain —
    # the bench_variants protocol)
    from denet_tpu.data.synthetic import make_uint8_batch, \
        make_uint8_batch_hard
    gen_u8 = (make_uint8_batch_hard if args.dist == "hard"
              else make_uint8_batch)
    srng = numpy.random.RandomState(3)
    xs_dev = [jnp.asarray(gen_u8(srng, 8, args.size, model.class_num)[0])
              for _ in range(8)]
    chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
    with chiplock.queue_busy():
        fn = model.build_full_detect_fn(detect_layer, 0.05, 0.5)
        params = model.inference_params()
        dets, _ = fn(params, model.state, xs_dev[0])
        numpy.asarray(dets)[:1]
        t0 = time.time()
        for i in range(args.bench_iters):
            dets, _ = fn(params, model.state, xs_dev[i % len(xs_dev)])
        numpy.asarray(dets)[:1]
        dt = time.time() - t0
    hz = 8 * args.bench_iters / dt
    print(json.dumps({"metric": args.tag,
                      "value": round(hz, 2), "unit": "images/sec",
                      "vs_baseline": round(hz / args.baseline_hz, 3)}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
