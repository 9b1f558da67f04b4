"""Controlled experiment: is the v2 occluded-stratum collapse caused by
serving-time corner clustering, and can an occlusion-aware quota fix it?
(VERDICT round 3, item 4.)

Round-3 feature matrix: v2 clustering wins small/medium/coverage but drops
the occluded stratum to 0.048 vs 0.135-0.19 for non-clustered variants.
Hypotheses:
  (a) serving-side merge: overlapping objects' candidates land in one
      connected component and the quota keeps only near-duplicates of the
      representative -> eval WITHOUT clustering should recover occluded mAP;
  (b) training-side distribution: the head never saw the second object of an
      overlapping pair as a sample -> no serving-time toggle recovers it.

Three evals of the SAME trained v2 checkpoint on the same held-out batches:
  1. clustered        — serving default (reference-faithful,
                        denet_sparse.cc:165-242 semantics);
  2. no-clustering    — nms_threshold forced to 1.0: plain corner-search
                        top sample_num^2 candidates (v1-style selection);
  3. distinct-second  — clustering with the occlusion-aware quota variant
                        (ops/cluster_device distinct_second=True: each
                        cluster's second kept member is the one LEAST
                        overlapping the representative).

Run: python -u scripts/occlusion_study.py \
         [--model models/variants/denet34_wide_v2.mdl.gz] [--batches 12]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import sys

import numpy


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("occlusion_study",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="models/variants/denet34_wide_v2.mdl.gz")
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--dist", choices=("easy", "hard"), default="hard")
    p.add_argument("--soft-nms", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.data.synthetic import make_batch, make_batch_hard
    from denet_tpu.utils import chiplock
    from eval_flagship_synth import run_eval

    logging.init(level="warning")

    gen = make_batch_hard if args.dist == "hard" else make_batch
    erng = numpy.random.RandomState(1234)      # held-out seed (eval protocol)

    def make_eval_batches(class_num):
        return [gen(erng, args.batch, args.size, class_num)
                for _ in range(args.batches)]

    configs = [
        ("clustered", {}),
        ("no-clustering", {"nms_threshold": 1.0}),
        ("distinct-second", {"cluster_distinct2": True}),
    ]
    det_params = {"prThreshold": 0.05, "nmsThreshold": 0.5,
                  "useSoftNMS": 1 if args.soft_nms else 0}

    batches = None
    results = {}
    for tag, surgery in configs:
        chiplock.yield_to_bench(log=lambda m: print(m, flush=True))
        # fresh load per config: the fused detect fn traces the sparse
        # layer's clustering config at build time.  One arm is minutes of
        # chip work — mark it busy for any arriving bench (chiplock).
        with chiplock.queue_busy():
            model = model_mod.load_from_file(args.model,
                                             batch_size=args.batch)
            model.compute_dtype = jnp.bfloat16
            detect_layer = model.layers[-1]
            sparse = detect_layer.sparse_layer
            assert sparse.nms_threshold < 1.0, \
                "occlusion study requires a v2 (clustering) checkpoint"
            for k, v in surgery.items():
                setattr(sparse, k, v)
            if batches is None:
                batches = make_eval_batches(model.class_num)
            print("=== %s ===" % tag, flush=True)
            dets = []
            for xs, metas in batches:
                dets += detect_layer.get_detections(model, xs, metas,
                                                    dict(det_params))
            results[tag] = run_eval(model, dets, args.size, tag="  ")

    base = results["clustered"]
    for tag in ("no-clustering", "distinct-second"):
        s = results[tag]
        print("%s vs clustered: occluded %+0.4f  small %+0.4f  COCO %+0.4f"
              % (tag, s["map_occluded"] - base["map_occluded"],
                 s["map_small"] - base["map_small"], s["map"] - base["map"]),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
