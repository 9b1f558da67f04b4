"""Same-process interleaved A/B: cluster-cap policy max vs opt (round 4).

The opt policy (ops/cluster_device.auto_cap_opt) serves the distribution's
working cap and escalates rare crowded batches to the reference cap;
the max policy sizes every batch for the worst draw.  Both are lossless
by construction (escalation guards).  Measurement rules (PERF.md): one
process, interleaved repeated arms, first window untrusted.

  python -u scripts/ab_cap_policy.py --models-dir models/variants \
      --only denet34_wide_v2 --reps 2
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import sys


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("ab_cap_policy",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--models-dir", default="models/variants")
    p.add_argument("--only", default="denet34_wide_v2")
    p.add_argument("--reps", type=int, default=2)
    p.add_argument("--out", default="/tmp/ab_cap_policy.jsonl")
    args = p.parse_args(argv)

    import os
    os.environ.setdefault("DENET_TPU_S2D_STEM", "1")
    import denet_tpu.utils.logging as logging
    logging.init(level="warning")

    from denet_tpu.utils import chiplock
    import bench_variants as bv

    only = set(args.only.split(","))
    rows = [r for r in bv.VARIANTS if r[0] in only]
    assert rows, "no matching variants"
    for rep in range(args.reps):
        for policy in ("max", "opt"):
            for row in rows:
                chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
                with chiplock.queue_busy():
                    res = bv.run_variant(*row, models_dir=args.models_dir,
                                         cap_policy=policy)
                res["rep"] = rep
                line = json.dumps(res)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    sys.exit(main())
