"""Optimized-HLO audit of the fused detection pipeline (VERDICT r1 item 4).

Compiles the full pipeline for the TPU, then ranks instructions by the
backend's own ``estimated_cycles`` (present in every fusion/copy backend
config of the scheduled module) — aggregated by op type and by source
line.  This is what located the round-2 wins: the S2D stem's bf16 input
transpose copy (now done on uint8 — half the bytes) and the per-step
f32->bf16 weight converts (now pre-cast once via Model.inference_params).
Round 5 parameterized it for the wide detect-phase/glue hunt (VERDICT r4
item 4): pass --variant wide --v2 --cluster-cap 2304 (or --model for a
trained checkpoint) to audit any pipeline config.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/analyze_hlo.py
"""
import argparse
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6): the audit attaches to
    # the device (param upload + inference_params) even though the compiled
    # fn is never executed
    with chiplock.chip_lease("analyze_hlo",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default=None,
                   help="audit a trained checkpoint instead of the "
                        "perturbed-head skip build")
    p.add_argument("--variant", default="skip", choices=("skip", "wide"))
    p.add_argument("--family", type=int, default=34, choices=(34, 101))
    p.add_argument("--v2", action="store_true")
    p.add_argument("--cluster-cap", type=int, default=None)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--top", type=int, default=15)
    p.add_argument("--train", action="store_true",
                   help="audit the jitted TRAIN step (nesterov, device "
                        "targets — the production training path) instead "
                        "of the fused detect pipeline")
    p.add_argument("--no-remat", action="store_true",
                   help="with --train: disable SPLIT-boundary remat "
                        "(the bench_train no-remat operating point)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy

    import denet_tpu.utils.logging as logging
    from __graft_entry__ import _build_detect_model
    from bench import perturb_heads_host

    logging.init(level="warning")

    batch, size = args.batch, args.size
    if args.model:
        import denet_tpu.core.model as model_mod
        model = model_mod.load_from_file(args.model, batch_size=batch)
    else:
        desc = None
        if args.variant != "skip" or args.family != 34 or args.v2:
            from denet_tpu.models import zoo
            desc = (zoo.denet34 if args.family == 34
                    else zoo.denet101)(args.variant, v2=args.v2)
        model = _build_detect_model(batch, size, class_num=80,
                                    desc_override=desc)
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]
    if not args.model:
        perturb_heads_host(model)
    model.ensure_on_device()

    if args.train:
        from denet_tpu.train.trainer import Trainer
        trainer = Trainer(model, solver_mode="nesterov", seed=1,
                          device_targets=True,
                          use_remat=False if args.no_remat else None)
        rng = numpy.random.RandomState(3)
        x = rng.uniform(0, 1, (batch, 3, size, size)).astype(numpy.float32)
        metas = []
        for _ in range(batch):
            n = rng.randint(1, 8)
            x0, y0 = rng.uniform(0, 0.7, n), rng.uniform(0, 0.7, n)
            w, h = rng.uniform(0.05, 0.3, n), rng.uniform(0.05, 0.3, n)
            metas.append({"bbox": list(zip(x0, y0, x0 + w, y0 + h)),
                          "class": rng.randint(0, 80, n).tolist()})
        x = jnp.asarray(x)
        targets, aux = trainer.prepare_targets(x, metas)
        hyper = numpy.array([0, 0, 0.01, 0.9, 0.999, 1e-4], numpy.float32)
        step = trainer._build_step()
        compiled = step.lower(model.params, trainer.slots, model.state,
                              x, targets, aux, hyper, trainer.rng).compile()
    else:
        kw = ({} if args.cluster_cap is None
              else {"cluster_cap": args.cluster_cap})
        fn = model.build_full_detect_fn(detect_layer, 0.01, 0.5,
                                        corner_k=256, top_m=128, top_n=100,
                                        **kw)
        x = numpy.zeros((batch, 3, size, size), numpy.uint8)
        params = model.inference_params()
        compiled = jax.jit(fn).lower(params, model.state, x).compile()
    txt = compiled.as_text()

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    if ca:
        print("flops/step: %.1f G   bytes accessed/step: %.2f GB" % (
            ca.get("flops", 0) / 1e9, ca.get("bytes accessed", 0) / 1e9))

    tot = 0
    by_src = defaultdict(int)
    by_op = defaultdict(int)
    rows = []
    for ls in txt.splitlines():
        m = re.search(r'"estimated_cycles":"(\d+)"', ls)
        if not m:
            continue
        cyc = int(m.group(1))
        tot += cyc
        sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', ls)
        src = ("%s:%s" % (sm.group(1).split("/")[-1], sm.group(2))) \
            if sm else "?"
        om = re.search(r'= \S+ (\w[\w\-\.]*)\(', ls)
        op = om.group(1).split(".")[0] if om else "?"
        by_src[src] += cyc
        by_op[op] += cyc
        rows.append((cyc, op, src, ls.strip()[:110]))

    print("total estimated cycles: %d (~%.2f ms at 940 MHz; scheduler "
          "estimate, not wall clock — use for RANKING)"
          % (tot, tot / 940e6 * 1e3))
    print("\nby op type:")
    for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
        print("  %-22s %10d  (%4.1f%%)" % (k, v, 100 * v / tot))
    print("\nby source line (top 20):")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
        print("  %-36s %10d  (%4.1f%%)" % (k, v, 100 * v / tot))
    rows.sort(reverse=True)
    print("\ntop %d single instructions:" % args.top)
    for cyc, op, src, l in rows[:args.top]:
        print("  %9d  %-12s %-30s %s" % (cyc, op, src, l[:95]))
    print("DONE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
