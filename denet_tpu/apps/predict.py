"""model-predict: evaluation CLI.

Reference-compatible surface (denet/model/predict.py): predict modes
``single`` (top1/top5), ``multicrop`` (10-crop summed), ``detect[,voc|mscoco|
imagenet][,image]`` and ``segment``; writes detections.json, VOC comp4 files
+ mAP, COCO results JSON, annotated detection images.
"""
import argparse
import os
import sys

import numpy

import denet_tpu.core.model as model_mod
import denet_tpu.data as dataset
import denet_tpu.utils as common
import denet_tpu.utils.logging as logging


def test_single(mode, model, data):
    y, yy, yt = [], [], []
    for subset in range(data.subset_num):
        logging.info("Subset %i: loading data..." % subset)
        data.load_from_subset(subset)
        labels = data.get_labels()
        logging.info("Subset %i: computing error..." % subset)
        pr = model.predict_output(data)
        for i in range(pr.shape[0]):
            k = min(5, pr.shape[1] - 1)
            y.append(int(numpy.argmax(pr[i])))
            yy.append(numpy.argsort(-pr[i])[:5] if k < 5 else
                      numpy.argpartition(-pr[i], k)[:5])
            yt.append(labels[i])

    y = numpy.asarray(y, numpy.int64)
    yy = numpy.asarray(yy, numpy.int64)
    yt = numpy.asarray(yt, numpy.int64)
    error1 = numpy.sum(yt != y) / yt.shape[0]
    error5 = 1.0 - numpy.sum(numpy.any(yy == yt[:, None], axis=1)) / yt.shape[0]
    logging.info("Top1 - Error Rate: %.3f%%" % (100.0 * error1))
    logging.info("Top5 - Error Rate: %.3f%%" % (100.0 * error5))
    return error1, error5


def test_multicrop(mode, model, data):
    y, yy, yt = [], [], []
    for subset in range(data.subset_num):
        logging.info("Subset %i: loading data..." % subset)
        data.load_from_subset(subset)
        labels = data.get_labels()
        pr = model.predict_output(data)
        n = pr.shape[0] // 10
        for i in range(n):
            pr_i = numpy.sum(pr[i * 10:(i + 1) * 10], axis=0)
            k = min(5, pr_i.shape[0] - 1)
            y.append(int(numpy.argmax(pr_i)))
            yy.append(numpy.argsort(-pr_i)[:5] if k < 5 else
                      numpy.argpartition(-pr_i, k)[:5])
            yt.append(labels[i * 10])

    y = numpy.asarray(y, numpy.int64)
    yy = numpy.asarray(yy, numpy.int64)
    yt = numpy.asarray(yt, numpy.int64)
    error1 = 1.0 - numpy.sum(yt == y) / yt.shape[0]
    error5 = 1.0 - numpy.sum(numpy.any(yy == yt[:, None], axis=1)) / yt.shape[0]
    logging.info("Top1 - Error Rate: %.3f%%" % (100.0 * error1))
    logging.info("Top5 - Error Rate: %.3f%%" % (100.0 * error5))
    return error1, error5


def export_detection_image(fname, data, class_labels_inv, dets=()):
    """Render class-colored bbox overlays + legend to a PNG."""
    import colorsys
    from PIL import Image, ImageDraw

    bboxs = []
    for pr, cls, bbox in dets:
        x0 = max(0, min(int(bbox[0] * data.shape[2]), data.shape[2] - 1))
        x1 = max(0, min(int(bbox[2] * data.shape[2]), data.shape[2] - 1))
        y0 = max(0, min(int(bbox[1] * data.shape[1]), data.shape[1] - 1))
        y1 = max(0, min(int(bbox[3] * data.shape[1]), data.shape[1] - 1))
        bboxs.append((cls, x0, y0, x1, y1))
    bboxs.sort(key=lambda t: -(t[3] - t[1]) * (t[4] - t[2]))

    cls_unique = sorted(set(cls for cls, *_ in bboxs))
    n = max(1, len(cls_unique))
    cls_colormap = {cls: colorsys.hsv_to_rgb(i / n, 0.5, 0.5)
                    for i, cls in enumerate(cls_unique)}

    alpha = 0.75
    overlay = numpy.zeros((4, data.shape[1], data.shape[2]), dtype=numpy.float32)
    for cls, x0, y0, x1, y1 in bboxs:
        rgb = cls_colormap[cls]
        border = numpy.array([*rgb, 1.0], dtype=numpy.float32)
        center = numpy.array([*rgb, alpha], dtype=numpy.float32)
        overlay[:, y0:y1, x0:x1] = center[:, None, None]
        for i in range(2):
            if y0 - i > 0:
                overlay[:, y0 - i, x0:x1] = border[:, None]
            if y1 + i < data.shape[1]:
                overlay[:, y1 + i, x0:x1] = border[:, None]
            if x0 - i > 0:
                overlay[:, y0:y1, x0 - i] = border[:, None]
            if x1 + i < data.shape[2]:
                overlay[:, y0:y1, x1 + i] = border[:, None]

    blended = overlay[3, None] * overlay[:3] + (1.0 - overlay[3, None]) * data
    im_d = numpy.clip(255 * blended, 0, 255).astype(numpy.uint8).transpose(1, 2, 0)
    im = Image.fromarray(im_d, "RGB")

    legend = Image.new("RGB", (im.size[0] + 256, im.size[1]), "black")
    legend.paste(im, (0, 0))
    draw = ImageDraw.Draw(legend)
    for i, (cls, rgb) in enumerate(cls_colormap.items()):
        rgb255 = tuple(int(c * 255) for c in rgb)
        x0, y0 = im.size[0], i * 20
        draw.rectangle((x0, y0, x0 + 16, y0 + 16), fill=rgb255, outline=rgb255)
        name = str(class_labels_inv.get(cls, cls))
        draw.text((x0 + 18, y0), name.capitalize(), rgb255)

    dname = os.path.dirname(fname)
    if dname and not os.path.isdir(dname):
        os.makedirs(dname)
    legend.save(fname)


def test_detector(mode, model, data, output_fname, params):
    detect_params = common.get_params_dict(params)
    logging.info("Using detector params:", detect_params)

    detect_layer = model.layers[-1]
    class_labels_inv = {v: k for k, v in model.class_labels.items()}
    index = 0
    detections = []
    for subset in range(data.subset_num):
        logging.info("Subset %i: loading data..." % subset)
        data.load_from_subset(subset)
        data_x, data_m, data_size = data.export(model.batch_size)

        logging.info("Subset %i: computing detections..." % subset)
        batch_num = data_x.shape[0] // model.batch_size

        def batch_iter():
            for n in range(batch_num):
                yield (data_x[n * model.batch_size:(n + 1) * model.batch_size],
                       data_m[n * model.batch_size:(n + 1) * model.batch_size])

        # pipelined device path (overlaps upload/compute/convert per batch);
        # host path handles soft-NMS / corner clustering automatically
        subset_det = detect_layer.get_detections_batched(model, batch_iter(),
                                                         detect_params)
        if "image" in mode:
            for i, r in enumerate(subset_det):
                b = i % model.batch_size
                n = i // model.batch_size
                dx = data_x[n * model.batch_size + b]
                export_detection_image("%06i_dets.png" % (index + i), dx,
                                       class_labels_inv, r["detections"])
        index += batch_num * model.batch_size
        detections += subset_det[:data_size]

    logging.info("Found %i detections for %i samples" % (
        sum(len(d["detections"]) for d in detections), len(detections)))

    out_dir = os.path.dirname(output_fname)
    if out_dir and not os.path.isdir(out_dir):
        os.makedirs(out_dir)
    fname = os.path.join(out_dir, "detections.json")
    logging.info("Saving raw detections to: " + fname)
    common.json_to_file(fname, {"dets": detections,
                                "classLabels": model.class_labels,
                                "detectParams": detect_params})

    if "voc" in mode:
        from denet_tpu.data import pascal_voc
        _, _, height, width = model.get_input_shape()
        pascal_voc.export_detections(out_dir or ".", detections, width, height,
                                     class_labels_inv)
        pascal_voc.get_precision(detections, detect_params.get("matchIOU", 0.5))
    elif "mscoco" in mode:
        logging.info("Exporting mscoco detections to:", output_fname + ".json")
        data.export_detections(output_fname + ".json", detections)
        # local COCO-protocol mAP when the subset carries annotations — the
        # reference could only score via the CodaLab server upload; the
        # in-repo evaluator (data/coco_eval.py) reports the published-table
        # metrics (mAP@[.5:.95]/@.5/@.75, size strata) directly
        if any(len(r["meta"].get("bbox", [])) for r in detections):
            from denet_tpu.data import coco_eval
            s = coco_eval.summarize(detections, model.class_num,
                                    image_size=model.get_input_shape()[3])
            logging.info(
                "COCO mAP@[.5:.95]=%.4f @0.5=%.4f @0.75=%.4f "
                "(small %.4f / medium %.4f / large %.4f)" % (
                    s["map"], s["map50"], s["map75"], s["map_small"],
                    s["map_medium"], s["map_large"]))
    elif "imagenet" in mode:
        from denet_tpu.data import imagenet
        imagenet.get_localization_error(detections)

    return detections


def test_segment(mode, model, data):
    """Per-pixel segmentation eval: confusion counts per class, predicted /
    ground-truth label-map PNG overlays, per-class accuracy / TPR / FPR and
    overall accuracy (reference predict.py:238-289)."""
    from denet_tpu.utils import image_util

    cls_tp = [0] * model.class_num
    cls_tn = [0] * model.class_num
    cls_fp = [0] * model.class_num
    cls_fn = [0] * model.class_num
    colors = [(255, 255, 255, 0), (255, 0, 0, 60), (0, 0, 255, 60)]
    if model.class_num > len(colors):
        colors += [tuple(int(255 * v) for v in rgb) + (60,) for rgb in
                   image_util.get_unique_colors(model.class_num - len(colors))]
    for subset in range(data.subset_num):
        data.load_from_subset(subset)
        pr = model.predict_output(data)
        label = numpy.argmax(pr, axis=1)
        for b in range(pr.shape[0]):
            label_predict = label[b]
            label_true = data.data[b][2]["label"]
            for cls in range(model.class_num):
                cls_tp[cls] += numpy.count_nonzero(
                    (label_true == cls) & (label_predict == cls))
                cls_fn[cls] += numpy.count_nonzero(
                    (label_true == cls) & (label_predict != cls))
                cls_fp[cls] += numpy.count_nonzero(
                    (label_true != cls) & (label_predict == cls))
                cls_tn[cls] += numpy.count_nonzero(
                    (label_true != cls) & (label_predict != cls))

            fname = data.data[b][0]
            hyperspec = numpy.asarray(data.data[b][1], dtype=numpy.float32)
            background = hyperspec.mean(axis=0) if hyperspec.ndim == 3 else None
            image_util.export_label(fname + "_predict.png", label_predict,
                                    colors, background=background)
            image_util.export_label(fname + "_true.png", label_true,
                                    colors, background=background)

    class_labels_inv = {v: k for k, v in model.class_labels.items()}
    overall_correct = 0
    overall_total = 0
    for cls in range(model.class_num):
        correct = cls_tp[cls] + cls_tn[cls]
        total = cls_tp[cls] + cls_fp[cls] + cls_fn[cls] + cls_tn[cls]
        overall_correct += correct
        overall_total += total
        tpr = 100 * cls_tp[cls] / max(1, cls_tp[cls] + cls_fn[cls])
        fpr = 100 * cls_fp[cls] / max(1, cls_fp[cls] + cls_tn[cls])
        print("Accuracy (%s): %.2f%%, TPR: %.2f%%, FPR: %.2f%% " % (
            class_labels_inv.get(cls, str(cls)),
            100 * correct / max(1, total), tpr, fpr))
    print("Overall Accuracy: %.2f%%" % (
        100 * overall_correct / max(1, overall_total)))


def build_parser():
    parser = argparse.ArgumentParser(
        description="Predict labels using trained model")
    logging.add_arguments(parser)
    parser.add_argument("--model", required=True)
    parser.add_argument("--input", required=True)
    parser.add_argument("--results", default="./results", type=str)
    parser.add_argument("--extension", default="png")
    parser.add_argument("--batch-size", type=int, default=100)
    parser.add_argument("--predict-mode", default="single")
    parser.add_argument("--thread-num", default=1, type=int)
    parser.add_argument("--params", default="", type=str)
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    logging.init(args)

    model = model_mod.load_from_file(args.model, args.batch_size)
    logging.info("Class labels:\n", model.class_labels)

    logging.info("Loading Dataset...")
    data = dataset.load(args.input, args.extension,
                        class_labels=model.class_labels,
                        thread_num=args.thread_num)

    if "single" in args.predict_mode:
        test_single(args.predict_mode, model, data)
    elif "multicrop" in args.predict_mode:
        assert "multicrop" in args.extension
        test_multicrop(args.predict_mode, model, data)
    elif "segment" in args.predict_mode:
        test_segment(args.predict_mode, model, data)
    elif "detect" in args.predict_mode:
        test_detector(args.predict_mode, model, data, args.results, args.params)
    logging.info("Done")


if __name__ == "__main__":
    sys.exit(main())
