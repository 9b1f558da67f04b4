"""Pascal VOC dataset reader, detection export and VOC2007 11-point mAP.

Reference: denet/dataset/pascal_voc.py — hardcoded 20-class labels,
ImageSets/Main txt + Annotations XML parsing (difficult flag, the -1 MATLAB
index offset), comp4 txt export, and the 11-point interpolated AP metric.
"""
import math
import os
import random
import sys
import xml.etree.ElementTree as xml

import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.data import DatasetAbstract
from denet_tpu.data.image_loader import ImageLoader

VOC_CLASS_LABELS = {"aeroplane": 0, "bicycle": 1, "bird": 2, "boat": 3,
                    "bottle": 4, "bus": 5, "car": 6, "cat": 7, "chair": 8,
                    "cow": 9, "diningtable": 10, "dog": 11, "horse": 12,
                    "motorbike": 13, "person": 14, "pottedplant": 15,
                    "sheep": 16, "sofa": 17, "train": 18, "tvmonitor": 19}

# ILSVRC statistics (natural-image prior, reference pascal_voc.py:123-129)
RGB_MEAN = numpy.array([0.485, 0.456, 0.406], dtype=numpy.float32)
RGB_STD = numpy.array([0.229, 0.224, 0.225], dtype=numpy.float32)
RGB_EIGEN_VAL = numpy.array([0.2175, 0.0188, 0.0045], dtype=numpy.float32)
RGB_EIGEN_VEC = numpy.array([[-0.5675, 0.7192, 0.4009],
                             [-0.5808, -0.0045, -0.8140],
                             [-0.5836, -0.6948, 0.4203]], dtype=numpy.float32)


def parse_voc_xml(obj_fname, class_labels):
    """Parse one VOC Annotations xml -> (bboxs, difficult)."""
    bboxs = []
    difficult = []
    obj_tree = xml.parse(obj_fname).getroot()
    for obj in obj_tree.iter("object"):
        cls = class_labels[obj.find("name").text]
        difficult.append(bool(int(obj.find("difficult").text) > 0))
        bndbox = obj.find("bndbox")
        # -1: VOC indices are 1-based
        bboxs.append((cls, (int(bndbox.find("xmin").text) - 1,
                            int(bndbox.find("ymin").text) - 1,
                            int(bndbox.find("xmax").text) - 1,
                            int(bndbox.find("ymax").text) - 1)))
    return bboxs, difficult


class DatasetPascalVOC(DatasetAbstract):
    def get_data_shape(self):
        return (3, self.output_size, self.output_size)

    def copy(self, copy_data=True):
        r = super().copy(copy_data)
        r.images = self.images
        r.image_loader = self.image_loader
        r.output_size = self.output_size
        return r

    def shuffle(self, mode="random"):
        random.shuffle(self.images)

    def load_from_subset(self, subset):
        index_start = subset * self.subset_size
        index_end = min((subset + 1) * self.subset_size, self.subset_total_size)
        logging.info("Loading from subset %i / %i (%i threads, %i start, "
                     "%i end)" % (subset, self.subset_num, self.thread_num,
                                  index_start, index_end))
        self.data = self.image_loader.load(self.images[index_start:index_end])
        self.subset_index = subset

    def load(self, input_dir, data_format, is_training, thread_num,
             class_labels=None):
        self.thread_num = thread_num
        format_params = common.get_params_dict(
            ",".join(data_format.split(",")[1:]))
        self.class_labels = dict(VOC_CLASS_LABELS)

        def get_files(data_set, image_set):
            logging.info("Loading pascal %s %s..." % (data_set, image_set))
            path = os.path.join(input_dir, data_set, "ImageSets", "Main",
                                image_set + ".txt")
            with open(path, "r") as f:
                return [os.path.join(input_dir, data_set, "JPEGImages",
                                     line.rstrip() + ".jpg")
                        for line in f.readlines()]

        files = []
        for year in ("2007", "2012"):
            params = [s for s in format_params if s.startswith(year)]
            param = params[0] if params else ""
            for subset in ("train", "val", "test"):
                if subset in param:
                    files += get_files("VOC" + year, subset)

        logging.info("Finding images / metadata")
        self.images = []
        for fname in files:
            anno_dir = os.path.join(os.path.dirname(os.path.dirname(fname)),
                                    "Annotations")
            obj_fname = os.path.join(
                anno_dir, os.path.splitext(os.path.basename(fname))[0] + ".xml")
            if os.path.isfile(obj_fname):
                bboxs, difficult = parse_voc_xml(obj_fname, self.class_labels)
            elif is_training:
                raise Exception("Could not find annotations for training data!")
            else:
                bboxs, difficult = [], []
            self.images.append({"fname": fname, "bboxs": bboxs,
                                "difficult": difficult})

        self.images.sort(key=lambda im: im["fname"])
        self.image_loader = ImageLoader(thread_num, is_training, format_params)
        self.image_loader.rgb_mean = RGB_MEAN
        self.image_loader.rgb_std = RGB_STD
        self.image_loader.rgb_eigen_val = RGB_EIGEN_VAL
        self.image_loader.rgb_eigen_vec = RGB_EIGEN_VEC

        self.output_size = self.image_loader.crop
        self.subset_size = min(format_params.get("images_per_subset", 10000),
                               max(1, len(self.images)))
        self.subset_total_size = len(self.images)
        self.subset_num = min(format_params.get("subset_num", sys.maxsize),
                              int(math.ceil(self.subset_total_size /
                                            self.subset_size)))
        self.subset_index = -1
        logging.info("Using Pascal VOC dataset - size:", self.subset_total_size,
                     "subset_num", self.subset_num, "images per subset:",
                     self.subset_size, self.image_loader)


def export_detections(output_dir, detections, width, height, class_labels_inv):
    """Write VOC comp4 result files (comp4_det_test_<cls>.txt)."""
    output = {}
    for r in detections:
        meta = r["meta"]
        image_id = os.path.splitext(os.path.basename(meta["image"]["fname"]))[0]
        scale_x, scale_y = meta["scale"]
        offset_x, offset_y = meta["offset"]
        image_width, image_height = meta["image_size"]

        for pr, cls, bbox in r["detections"]:
            x0 = max(min(int((bbox[0] * width + offset_x) / scale_x) + 1,
                         image_width), 1)
            y0 = max(min(int((bbox[1] * height + offset_y) / scale_y) + 1,
                         image_height), 1)
            x1 = max(min(int((bbox[2] * width + offset_x) / scale_x) + 1,
                         image_width), 1)
            y1 = max(min(int((bbox[3] * height + offset_y) / scale_y) + 1,
                         image_height), 1)
            output.setdefault(cls, []).append((image_id, pr, x0, y0, x1, y1))

    for cls, dets in output.items():
        fname = os.path.join(output_dir,
                             "comp4_det_test_%s.txt" % class_labels_inv[cls])
        with open(fname, "w") as f:
            for d in dets:
                f.write("%s %0.6f %.6f %.6f %.6f %.6f\n" % d)


def get_precision(detections, overlap_threshold=0.5, class_num=20,
                  class_labels_inv=None):
    """VOC2007 11-point interpolated mean AP over crop-normalized coords.

    Returns mean AP (also logs per-class numbers like the reference)."""
    if class_labels_inv is None:
        class_labels_inv = {v: k for k, v in VOC_CLASS_LABELS.items()}

    coverage = 0
    coverage_total = 0
    for r in detections:
        for cls_a, bbox_a in zip(r["meta"]["class"], r["meta"]["bbox"]):
            coverage_total += 1
            for _, cls_b, bbox_b in r["detections"]:
                if cls_a == cls_b and common.overlap_iou(bbox_a, bbox_b) > \
                        overlap_threshold:
                    coverage += 1
                    break
    if coverage_total:
        logging.info("coverage: %.2f%% (%i,%i)" % (
            100.0 * coverage / coverage_total, coverage, coverage_total))

    gts_cls = [[] for _ in range(class_num)]
    dts_cls = [[] for _ in range(class_num)]
    for image_id, r in enumerate(detections):
        for pr, cls, bbox in r["detections"]:
            dts_cls[cls].append((image_id, pr, bbox))
        difficult = r["meta"].get("image", {}).get(
            "difficult", [False] * len(r["meta"]["class"]))
        for cls, bbox, diff in zip(r["meta"]["class"], r["meta"]["bbox"],
                                   difficult):
            gts_cls[cls].append((image_id, diff, bbox))

    logging.info("Using overlap threshold: %.2f" % overlap_threshold)
    mean_ap = 0.0
    for cls in range(class_num):
        gts = gts_cls[cls]
        dts = sorted(dts_cls[cls], key=lambda d: -d[1])
        non_difficult_num = sum(1 for _, diff, _ in gts if not diff)

        tp = numpy.zeros(len(dts), dtype=numpy.int64)
        fp = numpy.zeros(len(dts), dtype=numpy.int64)
        gt_found = set()
        for d, (image_id, _pr, bbox) in enumerate(dts):
            overlap_max = 0.0
            overlap_index = 0
            for gt_i, (gt_image_id, _diff, gt_bbox) in enumerate(gts):
                if gt_image_id == image_id:
                    ov = common.overlap_iou(bbox, gt_bbox)
                    if ov > overlap_max:
                        overlap_max = ov
                        overlap_index = gt_i
            if overlap_max >= overlap_threshold:
                if not gts[overlap_index][1]:
                    if overlap_index in gt_found:
                        fp[d] = 1
                    else:
                        gt_found.add(overlap_index)
                        tp[d] = 1
            else:
                fp[d] = 1

        tp = numpy.cumsum(tp)
        fp = numpy.cumsum(fp)
        if non_difficult_num == 0 or len(dts) == 0:
            ap = 0.0
        else:
            recall = tp / non_difficult_num
            prec = tp / numpy.maximum(tp + fp, 1)
            ap = 0.0
            for t in numpy.linspace(0.0, 1.0, 11):
                n = recall >= t
                ap += (prec[n].max() if n.any() else 0.0) / 11

        mean_ap += ap
        logging.info("%s - AP: %.4f (%i detections, %i groundtruth, %i non "
                     "difficult)" % (class_labels_inv.get(cls, cls), ap,
                                     len(dts), len(gts), non_difficult_num))

    mean_ap /= class_num
    logging.info("Mean AP: %.4f" % mean_ap)
    return mean_ap
