"""ImageNet/ILSVRC dataset reader + top-5 localization error metric.

Reference: denet/dataset/imagenet.py — class_labels.txt / dir scan, cached
image_list.json with bboxes from the ILSVRC XML annotations, Facebook-resnet
RGB statistics and PCA eigen constants.
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
from denet_tpu.data.basic import DatasetFromDir
from denet_tpu.data.image_loader import ImageLoader

# from the facebook resnet implementation (reference imagenet.py:127-132)
RGB_MEAN = numpy.array([0.485, 0.456, 0.406], dtype=numpy.float32)
RGB_STD = numpy.array([0.229, 0.224, 0.225], dtype=numpy.float32)
RGB_EIGEN_VAL = numpy.array([0.2175, 0.0188, 0.0045], dtype=numpy.float32)
RGB_EIGEN_VEC = numpy.array([[-0.5675, 0.7192, 0.4009],
                             [-0.5808, -0.0045, -0.8140],
                             [-0.5836, -0.6948, 0.4203]], dtype=numpy.float32)


class DatasetImagenet(DatasetAbstract):
    def copy(self, copy_data=True):
        r = super().copy(copy_data)
        r.images = self.images
        r.image_loader = self.image_loader
        return r

    def shuffle(self, mode="random"):
        random.shuffle(self.images)

    def load_from_subset(self, subset):
        if self.subset_index == subset:
            return
        logging.info("Loading from subset %i / %i (%i threads)" % (
            subset, self.subset_num, self.thread_num))
        index_start = subset * self.subset_size
        index_end = min((subset + 1) * self.subset_size, self.subset_total_size)
        self.data = self.image_loader.load(self.images[index_start:index_end])
        self.subset_index = subset

    def load(self, input_dir, data_format, is_training, thread_num,
             class_labels=None):
        self.input_dir = input_dir.rstrip("/")
        self.thread_num = thread_num
        self.class_labels = class_labels

        # class_labels.txt next to the train/val dirs: "<index> <wnid>" lines
        fname = os.path.join(os.path.dirname(self.input_dir), "class_labels.txt")
        if os.path.isfile(fname) and self.class_labels is None:
            logging.info("Loading class labels from:", fname)
            self.class_labels = {}
            with open(fname, "r") as f:
                for line in f.readlines():
                    tokens = line.rstrip("\n").split(" ")
                    self.class_labels[tokens[1]] = int(tokens[0])
        elif self.class_labels is None:
            self.class_labels = DatasetFromDir.find_class_labels(input_dir)

        # cached image list (with bboxes parsed from the ILSVRC xml)
        list_fname = os.path.join(input_dir, "image_list.json")
        if os.path.isfile(list_fname):
            logging.info("Loading dataset metadata:", list_fname)
            json_data = common.json_from_file(list_fname)
            if json_data.get("version", 0) < 1:
                logging.warning("image_list.json is old version, missing "
                                "bounding boxs!")
                self.images = [{"fname": f, "bboxs": []}
                               for f in json_data["images"]]
            else:
                self.images = json_data["images"]
        else:
            bbox_dir = os.path.join(os.path.dirname(input_dir), "bbox")
            fnames = []
            for c in sorted(os.listdir(input_dir)):
                if not os.path.isdir(os.path.join(input_dir, c)):
                    continue
                images_cls = DatasetFromDir.find_paths(
                    os.path.join(input_dir, c), "*.JPEG")
                logging.info("Found %i images for class %s" % (len(images_cls), c))
                fnames += images_cls

            self.images = []
            for fname_i in fnames:
                cls_name = os.path.basename(os.path.dirname(fname_i))
                bboxs = []
                if os.path.isdir(bbox_dir):
                    obj_fname = os.path.join(
                        bbox_dir, cls_name,
                        os.path.splitext(os.path.basename(fname_i))[0] + ".xml")
                    if os.path.isfile(obj_fname):
                        obj_tree = xml.parse(obj_fname).getroot()
                        for obj in obj_tree.iter("object"):
                            bndbox = obj.find("bndbox")
                            bboxs.append({"x0": int(bndbox.find("xmin").text),
                                          "y0": int(bndbox.find("ymin").text),
                                          "x1": int(bndbox.find("xmax").text),
                                          "y1": int(bndbox.find("ymax").text)})
                self.images.append({"fname": fname_i, "bboxs": bboxs})

            try:
                logging.info("Saving dataset metadata:", list_fname)
                common.json_to_file(list_fname, {"images": self.images,
                                                 "version": 1})
            except Exception as e:
                logging.warning("failed to write buffered image list -", e)

        # normalize to the image_loader interface
        for image in self.images:
            cls = self.class_labels[os.path.basename(
                os.path.dirname(image["fname"]))]
            image["class"] = cls
            if image["bboxs"] and isinstance(image["bboxs"][0], dict):
                image["bboxs"] = [(cls, (bb["x0"], bb["y0"], bb["x1"], bb["y1"]))
                                  for bb in image["bboxs"]]

        format_params = common.get_params_dict(
            ",".join(data_format.split(",")[1:]))
        self.image_loader = ImageLoader(thread_num, is_training, format_params)
        self.image_loader.rgb_mean = RGB_MEAN
        self.image_loader.rgb_std = RGB_STD
        self.image_loader.rgb_eigen_val = RGB_EIGEN_VAL
        self.image_loader.rgb_eigen_vec = RGB_EIGEN_VEC

        self.subset_size = format_params.get("images_per_subset", 10000)
        self.use_null_class = format_params.get("null", False)
        self.subset_num = format_params.get("subset_num", sys.maxsize)

        if self.image_loader.is_training and format_params.get("bbox_only", False):
            self.images = [im for im in self.images if len(im["bboxs"]) > 0]

        if self.use_null_class and "null" not in self.class_labels:
            self.class_labels["null"] = len(self.class_labels)

        self.subset_index = -1
        self.subset_total_size = len(self.images)
        self.subset_num = min(self.subset_num,
                              int(math.ceil(self.subset_total_size /
                                            self.subset_size)))
        logging.info("Using Imagenet dataset - size:", self.subset_total_size,
                     "subset_num", self.subset_num, "images per subset:",
                     self.subset_size, self.image_loader)


def get_localization_error(detections):
    """Top-5 localization error (reference imagenet.py:159-180)."""
    error = 0
    for d in detections:
        meta = d["meta"]
        dets = sorted(d["detections"], key=lambda t: -t[0])
        positive = False
        for _, cls_a, bbox_a in dets[:5]:
            for cls_b, bbox_b in zip(meta["class"], meta["bbox"]):
                if cls_a == cls_b and common.overlap_iou(bbox_a, bbox_b) > 0.5:
                    positive = True
        if not positive:
            error += 1
    err = 100.0 * error / max(1, len(detections))
    logging.info("Imagenet localization error: %.2f (%i images)" % (
        err, len(detections)))
    return err
