"""MSCOCO dataset reader + COCO-format detection export.

Reference: denet/dataset/mscoco.py — parses instances_*.json /
image_info_*.json annotations, subsets 2014-train/val, 2014/2015-test,
2015-test-dev; exports results JSON with crop->original coordinate un-mapping.
"""
import json
import math
import os
import random
import sys

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.data import DatasetAbstract
from denet_tpu.data.image_loader import ImageLoader


class DatasetMSCOCO(DatasetAbstract):
    def get_data_shape(self):
        return (3, self.output_size, self.output_size)

    def copy(self, copy_data=True):
        r = super().copy(copy_data)
        r.images = self.images
        r.image_loader = self.image_loader
        r.output_size = self.output_size
        r.categories = self.categories
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
        self.thread_num = thread_num
        format_params = common.get_params_dict(
            ",".join(data_format.split(",")[1:]))

        data_types = []
        for flag, name in [("2014-train", "train2014"), ("2014-val", "val2014"),
                           ("2014-test", "test2014"), ("2015-test", "test2015"),
                           ("2015-test-dev", "test-dev2015")]:
            if format_params.get(flag, False):
                data_types.append(name)
        if not data_types:
            raise Exception("please specify mscoco subset")

        self.images = []
        self.class_labels = {}
        self.categories = None
        for data_type in data_types:
            if "test" in data_type:
                fname = os.path.join(input_dir, "annotations",
                                     "image_info_%s.json" % data_type)
            else:
                fname = os.path.join(input_dir, "annotations",
                                     "instances_%s.json" % data_type)
            with open(fname, "r") as f:
                json_data = json.load(f)

            data_categories = {}
            for json_cat in json_data["categories"]:
                data_categories[json_cat["id"]] = json_cat["name"]
                if json_cat["name"] not in self.class_labels:
                    self.class_labels[json_cat["name"]] = len(self.class_labels)
            assert self.categories is None or self.categories == data_categories
            self.categories = data_categories

            bboxs = {}
            for ann in json_data.get("annotations", []):
                cls_id = self.class_labels[self.categories[ann["category_id"]]]
                bbox = ann["bbox"]
                bboxs.setdefault(ann["image_id"], []).append(
                    (cls_id, (bbox[0], bbox[1], bbox[0] + bbox[2],
                              bbox[1] + bbox[3])))

            image_dir = "test2015" if data_type == "test-dev2015" else data_type
            for image in json_data["images"]:
                self.images.append({
                    "fname": os.path.join(input_dir, image_dir,
                                          image["file_name"]),
                    "bboxs": bboxs.get(image["id"], []),
                    "id": image["id"]})

        self.image_loader = ImageLoader(thread_num, is_training, format_params)

        self.output_size = self.image_loader.crop
        self.subset_size = format_params.get("images_per_subset", 10000)
        self.subset_total_size = len(self.images)
        self.subset_num = min(format_params.get("subset_num", sys.maxsize),
                              int(math.ceil(self.subset_total_size /
                                            self.subset_size)))
        self.subset_index = -1

        if self.image_loader.is_training and format_params.get("bbox_only", False):
            with_bbox = [im for im in self.images if len(im["bboxs"]) > 0]
            logging.info("Removed %i images without bboxs" % (
                len(self.images) - len(with_bbox)))
            self.images = with_bbox
            self.subset_total_size = len(self.images)

        logging.info("Using MSCOCO dataset - size:", self.subset_total_size,
                     "subset_num", self.subset_num, "images per subset:",
                     self.subset_size, self.image_loader)

    def export_detections(self, output_fname, detection_list):
        """Write COCO results JSON with crop->original coordinate un-mapping."""
        label_cat_map = {self.class_labels[name]: index
                         for index, name in self.categories.items()}

        results = []
        for d in detection_list:
            meta = d["meta"]
            image_id = meta["image"]["id"]
            scale_x, scale_y = meta["scale"]
            offset_x, offset_y = meta["offset"]
            image_width, image_height = meta["image_size"]

            dets = sorted(d["detections"], key=lambda t: -t[0])
            for pr, cls, bbox in dets:
                x0 = max(min((bbox[0] * self.output_size + offset_x) / scale_x + 1,
                             image_width), 1)
                y0 = max(min((bbox[1] * self.output_size + offset_y) / scale_y + 1,
                             image_height), 1)
                x1 = max(min((bbox[2] * self.output_size + offset_x) / scale_x + 1,
                             image_width), 1)
                y1 = max(min((bbox[3] * self.output_size + offset_y) / scale_y + 1,
                             image_height), 1)
                results.append({"image_id": image_id,
                                "category_id": label_cat_map[cls],
                                "bbox": [round(x0, 1), round(y0, 1),
                                         round(x1 - x0, 1), round(y1 - y0, 1)],
                                "score": round(pr, 6)})

        with open(output_fname, "w") as f:
            json.dump(results, f)
