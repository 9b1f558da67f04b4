"""Basic datasets: directory-of-class-dirs and npy array pairs.

Reference: denet/dataset/basic.py.
"""
import fnmatch
import os

import numpy
from PIL import Image

import denet_tpu.utils.logging as logging
from denet_tpu.data import DatasetAbstract


class DatasetFromDir(DatasetAbstract):
    @staticmethod
    def find_class_labels(src_dir):
        labels = {}
        for c in sorted(os.listdir(src_dir)):
            if os.path.isdir(os.path.join(src_dir, c)) and c not in labels:
                labels[c] = len(labels)
        return labels

    @staticmethod
    def find_paths(directory, pattern):
        paths = []
        for root, _dirs, files in os.walk(directory, topdown=False,
                                          followlinks=True):
            for basename in files:
                filename = os.path.join(root, basename)
                if fnmatch.fnmatch(filename, pattern):
                    paths.append(filename)
        paths.sort()
        return paths

    def load(self, input_dir, ext, is_training, thread_num, class_labels=None):
        self.class_labels = class_labels
        if self.class_labels is None:
            self.class_labels = DatasetFromDir.find_class_labels(input_dir)

        for c in sorted(os.listdir(input_dir)):
            if c not in self.class_labels:
                continue
            cls = self.class_labels[c]
            images = DatasetFromDir.find_paths(os.path.join(input_dir, c),
                                               "*." + ext)
            logging.info("Found class %s (%i) with %i images" % (c, cls,
                                                                 len(images)))
            for f in images:
                with Image.open(f) as imfile:
                    self.data.append((f.replace(input_dir, ""), imfile.copy(),
                                      {"image_class": cls, "partial": False}))

        self.data.sort(key=lambda d: d[2]["image_class"])
        self.subset_total_size = self.subset_size = len(self.data)
        logging.info("Loaded %i samples" % len(self))


class DatasetFromArray(DatasetAbstract):
    """Loads ``_data.npy`` (N,C,H,W) + ``_labels.npy`` pairs
    (reference basic.py:57-78).

    ``_labels.npy`` may be per-image class ids (N,) or per-pixel label maps
    (N,H,W) — the latter populates the ``label`` meta consumed by the
    ``segment`` predict mode (reference predict.py:238-289), making the
    segmentation path drivable from the stock loaders."""

    def load(self, src_prefix, ext, is_training, thread_num, class_labels=None):
        data = numpy.load(os.path.join(src_prefix, "_data.npy"))
        labels = numpy.load(os.path.join(src_prefix, "_labels.npy"))

        if class_labels is None:
            self.class_labels = {}
            for i in range(int(labels.min()), int(labels.max()) + 1):
                self.class_labels[str(i)] = len(self.class_labels)
        else:
            self.class_labels = class_labels

        self.data = []
        for i in range(data.shape[0]):
            if labels.ndim == 1:
                meta = {"image_class": self.class_labels[str(int(labels[i]))],
                        "partial": False}
            else:  # per-pixel segmentation label maps
                meta = {"label": numpy.asarray(labels[i], dtype=numpy.int64),
                        "partial": False}
            self.data.append(("array_%i" % i,
                              numpy.asarray(data[i], dtype=numpy.float32),
                              meta))
        self.subset_total_size = self.subset_size = len(self.data)
