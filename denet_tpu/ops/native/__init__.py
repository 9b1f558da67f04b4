"""Compile-on-demand loader for the native host ops (ctypes ABI).

Replaces the reference's Theano-cmodule import-time compilation
(denet/common/__init__.py:171-195) with a hash-cached g++ build of
``denet_ops.cc`` into a shared library loaded via ctypes.
"""
import ctypes
import hashlib
import os
import subprocess
import threading

import numpy

_lib = None
_lock = threading.Lock()

_SRC = os.path.join(os.path.dirname(__file__), "denet_ops.cc")


def _cache_dir():
    d = os.environ.get("DENET_TPU_CACHE",
                       os.path.join(os.path.expanduser("~"), ".cache", "denet_tpu"))
    os.makedirs(d, exist_ok=True)
    return d


def _build():
    with open(_SRC, "rb") as f:
        src = f.read()
    h = hashlib.sha256(src).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), "denet_ops_%s.so" % h)
    if not os.path.exists(so_path):
        tmp = so_path + ".tmp.%d" % os.getpid()
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               "-fno-math-errno", _SRC, "-o", tmp]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so_path)
    return so_path


def get_lib():
    global _lib
    if _lib is None:
        with _lock:
            if _lib is None:
                lib = ctypes.CDLL(_build())
                f32p = ctypes.POINTER(ctypes.c_float)
                i32p = ctypes.POINTER(ctypes.c_int)
                lib.build_samples.argtypes = [
                    f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_float, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                    ctypes.c_float, ctypes.c_int, f32p, f32p, i32p]
                lib.build_samples.restype = None
                lib.build_detections_nms.argtypes = [
                    ctypes.c_float, ctypes.c_float, ctypes.c_int,
                    f32p, f32p, f32p, i32p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_int, ctypes.c_int, f32p, i32p]
                lib.build_detections_nms.restype = None
                lib.cluster_samples.argtypes = [
                    f32p, f32p, i32p, ctypes.c_int, ctypes.c_int,
                    ctypes.c_float, ctypes.c_int, ctypes.c_int,
                    f32p, f32p, i32p]
                lib.cluster_samples.restype = None
                _lib = lib
    return _lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def build_samples_arrays(thread_num, corner_diff, corner_threshold, sample_num,
                         max_corners, local_max, cluster_threshold):
    """Corner diff maps -> (bbox (B,sn^2,4), pr (B,sn^2), count (B,)) arrays.

    ``corner_diff`` is (B, corner_num, H, W) float32 with
    d = log pr_f - log pr_t per position (computed on device — half the
    host transfer of the full 2-channel heatmap).  This is the zero-copy hot
    path used at inference; ``build_samples`` wraps it with the reference's
    list-of-tuples return structure.
    """
    corner_diff = numpy.ascontiguousarray(corner_diff, dtype=numpy.float32)
    b, corner_num, h, w = corner_diff.shape
    sc = sample_num * sample_num
    out_bbox = numpy.zeros((b, sc, 4), dtype=numpy.float32)
    out_pr = numpy.zeros((b, sc), dtype=numpy.float32)
    out_count = numpy.zeros((b,), dtype=numpy.int32)
    get_lib().build_samples(
        _f32p(corner_diff), b, corner_num, h, w,
        ctypes.c_float(corner_threshold), sample_num, max_corners, local_max,
        ctypes.c_float(cluster_threshold), thread_num,
        _f32p(out_bbox), _f32p(out_pr), _i32p(out_count))
    return out_bbox, out_pr, out_count


def cluster_samples(bbox, pr, count, threshold, input_num, output_num):
    """Greedy corner clustering + quota redistribution over precomputed
    candidates (reference apply_cluster semantics, denet_sparse.cc:165-242).

    bbox (B, n, 4) float32, pr (B, n) higher-better, count (B,) -> clustered
    (bbox (B, output_num, 4), pr (B, output_num), count (B,))."""
    bbox = numpy.ascontiguousarray(bbox, dtype=numpy.float32)
    pr = numpy.ascontiguousarray(pr, dtype=numpy.float32)
    count = numpy.ascontiguousarray(count, dtype=numpy.int32)
    b, n, _ = bbox.shape
    out_bbox = numpy.zeros((b, output_num, 4), dtype=numpy.float32)
    out_pr = numpy.zeros((b, output_num), dtype=numpy.float32)
    out_count = numpy.zeros((b,), dtype=numpy.int32)
    get_lib().cluster_samples(
        _f32p(bbox), _f32p(pr), _i32p(count), b, n,
        ctypes.c_float(threshold), input_num, output_num,
        _f32p(out_bbox), _f32p(out_pr), _i32p(out_count))
    return out_bbox, out_pr, out_count


def samples_to_lists(out_bbox, out_pr, out_count):
    """Array results -> per-image [(pr, (x0, y0, x1, y1)), ...] lists."""
    samples = []
    for i in range(out_bbox.shape[0]):
        n = int(out_count[i])
        bb = out_bbox[i, :n].tolist()
        pr = out_pr[i, :n].tolist()
        samples.append([(pr[j], tuple(bb[j])) for j in range(n)])
    return samples


def build_samples(thread_num, corner_pr, corner_threshold, sample_num,
                  max_corners, local_max, cluster_threshold):
    """Corner heatmaps -> per-image list of (pr, (x0, y0, x1, y1)) samples.

    Same call signature / return structure as the reference extension
    (denet/layer/denet_sparse.cc build_samples); accepts either the full
    (B, 2, cn, H, W) heatmap or a precomputed (B, cn, H, W) diff map.
    """
    corner_pr = numpy.asarray(corner_pr, dtype=numpy.float32)
    if corner_pr.ndim == 5:
        corner_diff = corner_pr[:, 0] - corner_pr[:, 1]
    else:
        corner_diff = corner_pr
    return samples_to_lists(*build_samples_arrays(
        thread_num, corner_diff, corner_threshold, sample_num, max_corners,
        local_max, cluster_threshold))


def build_detections_nms(pr_threshold, nms_threshold, use_soft_nms, det_pr,
                         fitness, bbox, bbox_num, max_dets=None):
    """Thresholded per-class NMS -> per-image list of (pr, cls, bbox).

    Mirrors the reference extension (denet/layer/denet_detect.cc) — returned
    ``pr`` is exp(score).
    """
    det_pr = numpy.ascontiguousarray(det_pr, dtype=numpy.float32)
    fitness = numpy.ascontiguousarray(fitness, dtype=numpy.float32)
    bbox = numpy.ascontiguousarray(bbox, dtype=numpy.float32)
    b, class_num_p1, sn, _ = det_pr.shape
    bbox_num = numpy.asarray(bbox_num, dtype=numpy.int32)
    if max_dets is None:
        max_dets = (class_num_p1 - 1) * sn * sn
    out_dets = numpy.zeros((b, max_dets, 6), dtype=numpy.float32)
    out_count = numpy.zeros((b,), dtype=numpy.int32)
    get_lib().build_detections_nms(
        ctypes.c_float(pr_threshold), ctypes.c_float(nms_threshold),
        int(use_soft_nms), _f32p(det_pr), _f32p(fitness), _f32p(bbox),
        _i32p(bbox_num), b, class_num_p1, sn, max_dets,
        _f32p(out_dets), _i32p(out_count))

    import math
    detlists = []
    for i in range(b):
        dets = []
        for j in range(int(out_count[i])):
            row = out_dets[i, j]
            dets.append((math.exp(float(row[0])), int(row[1]),
                         (float(row[2]), float(row[3]), float(row[4]), float(row[5]))))
        detlists.append(dets)
    return detlists
