"""Held-out mAP of the trained flagship checkpoint (bench model evidence).

Loads models/denet34_skip_synth512.mdl.gz and evaluates VOC 11-point
mAP@0.5 on HELD-OUT synthetic data (a seed never used in training — the
training pool was RandomState(7), bench staging RandomState(3)).  Shows
the checkpoint behind the benchmark headline is a working detector, not
just a timing fixture.

Run: python scripts/eval_flagship_synth.py [--batches 12]
"""
import argparse
import os
import sys

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, default=12)
    p.add_argument("--model", default="models/denet34_skip_synth512.mdl.gz")
    p.add_argument("--pr-threshold", type=float, default=0.05)
    p.add_argument("--nms-threshold", type=float, default=0.5)
    p.add_argument("--soft-nms", action="store_true",
                   help="gaussian Soft-NMS on the fused device path")
    p.add_argument("--int8", action="store_true",
                   help="serve through the int8 PTQ trunk "
                        "(denet_tpu/serve/quant.py); reports the mAP cost "
                        "of quantization vs the bf16 path")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import denet_tpu.core.model as model_mod
    import denet_tpu.utils.logging as logging
    from denet_tpu.data import pascal_voc
    from denet_tpu.data.synthetic import make_batch

    logging.init(level="warning")
    model = model_mod.load_from_file(args.model, batch_size=8)
    model.compute_dtype = jnp.bfloat16
    model.ensure_on_device()
    detect_layer = model.layers[-1]
    size = model.data_shape[1]

    rng = numpy.random.RandomState(1234)       # held-out seed
    detections = []
    if args.int8:
        from denet_tpu.data.synthetic import make_uint8_batch
        from denet_tpu.ops.nms_device import dets_to_lists
        from denet_tpu.serve import quant as quant_mod

        crng = numpy.random.RandomState(77)    # calibration != eval seed
        calib = [make_uint8_batch(crng, model.batch_size, size,
                                  model.class_num)[0] for _ in range(4)]
        plan, qparams = quant_mod.quantize(model, calib)
        fn = quant_mod.build_quant_detect_fn(
            model, detect_layer, plan, args.pr_threshold,
            args.nms_threshold)
        params = model.inference_params()
        for _ in range(args.batches):
            # same rng stream as make_batch -> identical held-out scenes
            xs_u8, metas = make_uint8_batch(rng, model.batch_size, size,
                                            model.class_num)
            dets, _counts = fn(qparams, params, model.state,
                               jnp.asarray(xs_u8))
            for meta, lst in zip(metas, dets_to_lists(numpy.asarray(dets))):
                detections.append({"meta": meta, "detections": lst})
    else:
        for _ in range(args.batches):
            xs, metas = make_batch(rng, model.batch_size, size,
                                   model.class_num)
            detections += detect_layer.get_detections(
                model, xs, metas,
                {"prThreshold": args.pr_threshold,
                 "nmsThreshold": args.nms_threshold,
                 "useSoftNMS": 1 if args.soft_nms else 0})

    # coverage: fraction of gt boxes matched by a class-correct detection
    # at IoU>0.5 (the reference's own logged training metric)
    from denet_tpu.utils import overlap_iou
    hits = tot = 0
    for r in detections:
        for cls_a, bb_a in zip(r["meta"]["class"], r["meta"]["bbox"]):
            tot += 1
            if any(cls_b == cls_a and overlap_iou(bb_a, bb_b) > 0.5
                   for _pr, cls_b, bb_b in r["detections"]):
                hits += 1

    inv = {v: k for k, v in model.class_labels.items()}
    mean_ap = pascal_voc.get_precision(detections, 0.5,
                                       class_num=model.class_num,
                                       class_labels_inv=inv)
    print("held-out synthetic mAP@0.5 = %.4f, class-correct coverage "
          "%d/%d (%.1f%%) over %d images" % (
              mean_ap, hits, tot, 100.0 * hits / max(1, tot),
              args.batches * model.batch_size), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
