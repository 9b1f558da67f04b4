"""Shared small utilities (timers, bbox math, param-string parsing).

Covers the surface of the reference denet/common/__init__.py minus the
Theano-specific helpers.
"""
import fnmatch
import os
import time

import numpy

from denet_tpu.utils.json_util import (json_from_file, json_from_gz,  # noqa: F401
                                       json_to_file, json_to_gz)


class Timer:
    """Multi-mark stopwatch used to instrument hot paths."""

    def __init__(self):
        self.reset()

    def mark(self):
        self.marks.append(time.time())

    def reset(self):
        self.marks = [time.time()]

    def current(self):
        return time.time() - self.marks[0]

    def current_ms(self):
        return 1000 * self.current()

    def delta(self, key0, key1=None):
        if key1 is None:
            key1 = key0 + 1
        return self.marks[key1] - self.marks[key0]

    def delta_ms(self, key0, key1=None):
        return 1000 * self.delta(key0, key1)

    def deltas(self):
        return [self.marks[i + 1] - self.marks[i] for i in range(len(self.marks) - 1)]

    def deltas_ms(self):
        return [1000 * d for d in self.deltas()]


def find_files(directory, pattern):
    paths = []
    for root, _dirs, files in os.walk(directory, topdown=False, followlinks=True):
        for basename in files:
            filename = os.path.join(root, basename)
            if fnmatch.fnmatch(filename, pattern):
                paths.append(filename)
    paths.sort()
    return paths


def find_layers(layers, layer_names, warn_missing=False):
    """Find the first layer of each requested type_name in a layer list."""
    if isinstance(layer_names, str):
        layer_names = [layer_names]

    found = [None] * len(layer_names)
    for layer in layers:
        for i, name in enumerate(layer_names):
            if found[i] is None and layer.type_name == name:
                found[i] = layer

    if warn_missing:
        missing = [layer_names[i] for i, f in enumerate(found) if f is None]
        if missing:
            raise Exception("Could not find layers of name: %s" % missing)

    return found[0] if len(layer_names) == 1 else found


# -- bbox helpers (bboxes are (x_min, y_min, x_max, y_max)) ------------------

def overlap(bbox0, bbox1=(0, 0, 1, 1)):
    dx = max(0, min(bbox0[2], bbox1[2]) - max(bbox0[0], bbox1[0]))
    dy = max(0, min(bbox0[3], bbox1[3]) - max(bbox0[1], bbox1[1]))
    return dx * dy


def overlap_rel(bbox0, bbox1=(0, 0, 1, 1)):
    a = (bbox0[2] - bbox0[0]) * (bbox0[3] - bbox0[1])
    return overlap(bbox0, bbox1) / a if a > 0 else 0.0


def overlap_iou(bbox0, bbox1=(0, 0, 1, 1)):
    a0 = (bbox0[2] - bbox0[0]) * (bbox0[3] - bbox0[1])
    a1 = (bbox1[2] - bbox1[0]) * (bbox1[3] - bbox1[1])
    ai = overlap(bbox0, bbox1)
    return ai / (a0 + a1 - ai)


def iou_matrix(bboxes_a, bboxes_b):
    """Batched IoU matrix (len(a), len(b)) computed with vectorized numpy.

    Replaces the compiled Theano helper the reference used
    (denet/common/theano_util.py get_overlap_iou).
    """
    if len(bboxes_a) == 0 or len(bboxes_b) == 0:
        return None
    a = numpy.asarray(bboxes_a, dtype=numpy.float32)
    b = numpy.asarray(bboxes_b, dtype=numpy.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    dx = numpy.maximum(numpy.minimum(a[:, None, 2], b[None, :, 2])
                       - numpy.maximum(a[:, None, 0], b[None, :, 0]), 0)
    dy = numpy.maximum(numpy.minimum(a[:, None, 3], b[None, :, 3])
                       - numpy.maximum(a[:, None, 1], b[None, :, 1]), 0)
    inter = dx * dy
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union


def clip(x, x_min=None, x_max=None):
    if x_min is None:
        return min(x, x_max)
    if x_max is None:
        return max(x, x_min)
    return min(x_max, max(x, x_min))


def ndarray_unpack(v, shapes):
    """Unpack a flat array into a list of arrays of the given shapes."""
    index = 0
    out = []
    for shape in shapes:
        size = int(numpy.prod(shape))
        out.append(v[index:index + size].reshape(shape))
        index += size
    return out


def print_flush(*args, **kwargs):
    print(*args, **kwargs)
    import sys as _sys
    _sys.stdout.flush()


def get_flat_index(stride, *args):
    """Flat index from per-axis strides (reference common/__init__.py:121-122)."""
    return sum(x * s for x, s in zip(args, stride))


def convert_num(s):
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def get_params_dict(params):
    """Parse ``k0=v0,k1=v1,flag`` strings into a dict (flags map to True)."""
    out = {}
    for token in params.split(","):
        pv = token.split("=")
        out[pv[0]] = True if len(pv) == 1 else convert_num(pv[1])
    return out
