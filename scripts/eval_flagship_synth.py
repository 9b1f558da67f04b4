"""Held-out detection eval of a trained checkpoint (bench model evidence).

Evaluates VOC 11-point mAP@0.5 AND the COCO protocol (mAP@[0.5:0.95] /
@0.5 / @0.75, small/medium/large area strata, occlusion strata) on held-out
synthetic data — a seed never used in training (training pool RandomState(7),
bench staging RandomState(3)).

``--dist hard`` evaluates on the round-3 graded distribution
(data/synthetic.py make_batch_hard: 8px..frame scales, 1:4 aspects,
crowding, truncation, exact per-gt visibility) whose strata keep headroom
visible after the original distribution saturated at its occlusion ceiling
(PERF.md "mAP saturation point").

Run: python scripts/eval_flagship_synth.py [--batches 12] [--dist hard]
"""
import argparse
import os
import sys

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def occlusion_strata():
    def visible(meta, i):
        return meta.get("visible_frac", [1.0] * 10 ** 6)[i] >= 0.5

    def occluded(meta, i):
        vf = meta.get("visible_frac")
        return vf is not None and vf[i] < 0.5

    return {"vis50": visible, "occluded": occluded}


def run_eval(model, detections, size, tag=""):
    """Print the full metric block for a detections list; returns the dict."""
    from denet_tpu.data import coco_eval, pascal_voc
    from denet_tpu.utils import overlap_iou

    hits = tot = 0
    for r in detections:
        for cls_a, bb_a in zip(r["meta"]["class"], r["meta"]["bbox"]):
            tot += 1
            if any(cls_b == cls_a and overlap_iou(bb_a, bb_b) > 0.5
                   for _pr, cls_b, bb_b in r["detections"]):
                hits += 1

    inv = {v: k for k, v in model.class_labels.items()}
    voc = pascal_voc.get_precision(detections, 0.5,
                                   class_num=model.class_num,
                                   class_labels_inv=inv)
    s = coco_eval.summarize(detections, model.class_num, image_size=size,
                            strata=occlusion_strata())
    print("%sVOC mAP@0.5 = %.4f | COCO mAP@[.5:.95] = %.4f  @0.5 = %.4f  "
          "@0.75 = %.4f" % (tag, voc, s["map"], s["map50"], s["map75"]),
          flush=True)
    print("%s  strata: small %.4f  medium %.4f  large %.4f  |  vis>=0.5 "
          "%.4f  occluded %.4f  (%d classes with gt)" % (
              tag, s["map_small"], s["map_medium"], s["map_large"],
              s["map_vis50"], s["map_occluded"], s["classes_with_gt"]),
          flush=True)
    print("%s  class-correct coverage %d/%d (%.1f%%) over %d images" % (
        tag, hits, tot, 100.0 * hits / max(1, tot), len(detections)),
        flush=True)
    s["voc_map50"] = voc
    s["coverage"] = hits / max(1, tot)
    return s


def main(argv=None):
    from denet_tpu.utils import chiplock
    # single-writer relay guard (VERDICT r4 item 6)
    with chiplock.chip_lease("eval_flagship_synth",
                             log=lambda m: print(m, flush=True)):
        return _main(argv)


def _main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--model", default="models/denet34_skip_synth512.mdl.gz")
    p.add_argument("--dist", choices=("easy", "hard"), default="easy")
    p.add_argument("--pr-threshold", type=float, default=0.05)
    p.add_argument("--nms-threshold", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1234,
                   help="held-out data seed (training used 7, bench 3)")
    p.add_argument("--soft-nms", action="store_true",
                   help="gaussian Soft-NMS on the fused device path")
    p.add_argument("--cluster-cap", type=int, default=None,
                   help="clusterCap for v2 device corner clustering "
                        "(candidates entering the N^2 merge; mAP-vs-perf "
                        "sweep evidence in PERF.md)")
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ trunk "
                        "(denet_tpu/serve/quant.py); reports the mAP cost "
                        "of quantization vs the bf16 path")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.data.synthetic import (make_batch, make_batch_hard,
                                          make_uint8_batch,
                                          make_uint8_batch_hard)

    logging.init(level="warning")
    model = model_mod.load_from_file(args.model, batch_size=8)
    model.compute_dtype = jnp.bfloat16
    model.ensure_on_device()
    detect_layer = model.layers[-1]
    size = model.data_shape[1]

    gen = make_batch_hard if args.dist == "hard" else make_batch
    gen_u8 = make_uint8_batch_hard if args.dist == "hard" else make_uint8_batch

    rng = numpy.random.RandomState(args.seed)
    detections = []
    if args.int8:
        from denet_tpu.ops.nms_device import dets_to_lists
        from denet_tpu.serve import quant as quant_mod

        crng = numpy.random.RandomState(77)    # calibration != eval seed
        calib = [gen_u8(crng, model.batch_size, size,
                        model.class_num)[0] for _ in range(4)]
        plan, qparams = quant_mod.quantize(model, calib)
        fn = quant_mod.build_quant_detect_fn(
            model, detect_layer, plan, args.pr_threshold,
            args.nms_threshold)
        params = model.inference_params()
        for _ in range(args.batches):
            # same rng stream as the f32 generator -> identical scenes
            xs_u8, metas = gen_u8(rng, model.batch_size, size,
                                  model.class_num)
            dets, _counts = fn(qparams, params, model.state,
                               jnp.asarray(xs_u8))
            for meta, lst in zip(metas, dets_to_lists(numpy.asarray(dets))):
                detections.append({"meta": meta, "detections": lst})
    else:
        import time
        t0 = time.time()
        for bi in range(args.batches):
            xs, metas = gen(rng, model.batch_size, size, model.class_num)
            dparams = {"prThreshold": args.pr_threshold,
                       "nmsThreshold": args.nms_threshold,
                       "useSoftNMS": 1 if args.soft_nms else 0}
            if args.cluster_cap is not None:
                dparams["clusterCap"] = args.cluster_cap
            detections += detect_layer.get_detections(
                model, xs, metas, dparams)
            print("batch %d/%d (%.0fs)" % (bi + 1, args.batches,
                                           time.time() - t0), flush=True)

    run_eval(model, detections, size)
    return 0


if __name__ == "__main__":
    sys.exit(main())
