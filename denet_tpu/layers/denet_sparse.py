"""DeNet directed-sparse-sampling layer (`DNS` desc token).

Reference: denet/layer/denet_sparse.py + denet_sparse_op.py + the host C++
search (denet_sparse.cc).  Per training/inference step:

  1. a jitted *corner function* runs the trunk through the corner layer and
     returns the corner log-prob heatmaps (and, at inference, the sample
     feature map which stays on device for the detect phase),
  2. the native host extension pairs thresholded corners into candidate
     bboxes (``denet_tpu.ops.native.build_samples``),
  3. training only: ground-truth coverage bookkeeping, random-sample padding
     and gt-bbox injection (denet_sparse.py:164-206),
  4. the device gather (``denet_tpu.ops.sparse_gather``) samples a gs x gs
     nearest-neighbour grid per bbox producing (B, F*gs^2+2, sn, sn).

The sample bbox array enters the jitted step as a regular device input
(``ctx.aux["sample_bbox"]``) instead of a mutated shared variable.
"""
import math
import os
import random

import jax.numpy as jnp
import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import Layer
from denet_tpu.ops.sparse_gather import sparse_gather
from denet_tpu.ops import native


def _gather_impl():
    """RoI-gather lowering, read at TRACE time (each jit build re-reads it;
    see ops/sparse_gather.py docstring).  DENET_TPU_GATHER=nchw selects the
    spatial take_along_axis variant for A/B (scripts/ab_gather.py)."""
    return os.environ.get("DENET_TPU_GATHER", "flat")


class DeNetSparseLayer(Layer):
    type_name = "denet-sparse"

    def __init__(self, layers, grid_size=3, sample_num=16, corner_threshold=0.01,
                 random_sample=0.0, local_max=0, nms_threshold=0.7,
                 sample_gt=True, version="v2", json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.batch_size = self.input_shape[0]
        self.grid_size = json_param.get("gridSize", grid_size)
        self.sample_num = json_param.get("sampleNum", sample_num)
        self.sample_gt = json_param.get("sampleGT", sample_gt)
        self.corner_threshold = json_param.get("cornerThreshold", corner_threshold)
        self.nms_threshold = json_param.get("nmsThreshold", nms_threshold)
        self.random_sample = json_param.get("randomSample", random_sample)
        self.local_max = json_param.get("localMax", local_max)
        self.version = json_param.get("version", version)

        self.corner_max = 1024
        self.thread_num = self.batch_size
        self.sample_count = self.sample_num * self.sample_num

        self.corner_layer = common.find_layers(layers, "denet-corner", True)
        assert self.corner_layer is not None, \
            "denet-corner layer required before sparse layer!"

        self.sample_bbox_list = []
        self.output_feat = (self.grid_size * self.grid_size *
                            self.corner_layer.sample_shape[1] + 2)
        self.output_shape = (self.batch_size, self.output_feat,
                             self.sample_num, self.sample_num)

        self._corner_fn = {}
        logging.verbose("Adding", self)

    def apply(self, params, state, outputs, ctx):
        import os
        import jax

        corner_idx = self.corner_layer.layer_index
        if corner_idx in ctx.collect:
            sample_input = ctx.collect[corner_idx]["sample"]
        else:
            # detect phase: corner pass already ran; features arrive as input
            sample_input = ctx.aux["sample_feat"]
        sample_bbox = ctx.aux.get("sample_bbox")
        if sample_bbox is None:
            # fused device-target training: corner search + random sample
            # selection traced into the train step itself (no separate corner
            # pass, no candidate download, selection on CURRENT params)
            sample_bbox = self._select_samples_device(ctx)
            ctx.collect[self.layer_index] = {"sample_bbox": sample_bbox}
        # Pallas MXU one-hot-matmul gather (opt-in via DENET_TPU_PALLAS=1;
        # the XLA gather is the default — see ops/sparse_gather_pallas.py)
        if (os.environ.get("DENET_TPU_PALLAS", "0") == "1" and
                jax.default_backend() == "tpu"):
            from denet_tpu.ops import sparse_gather_pallas as sgp
            if sgp.supported_shape(sample_bbox):
                y = sgp.sparse_gather_pallas(sample_input, sample_bbox,
                                             self.grid_size)
            else:  # wide heads: the XLA gather is faster (see kernel notes)
                y = sparse_gather(sample_input, sample_bbox, self.grid_size,
                                  impl=_gather_impl())
        else:
            y = sparse_gather(sample_input, sample_bbox, self.grid_size,
                              impl=_gather_impl())
        return y, {}

    # caps on candidates entering the traced device clustering (bounds the
    # N^2 adjacency bitmap; the reference host path admits 10*sample_count —
    # 23040 for the wide config, a 530MB bitmap per image).  Inference uses
    # the full cap; the TRAINING selection uses a smaller one — selection
    # trims to (1-random_sample)*sn^2 candidates and pads/injects gt anyway,
    # so the deep pr-tail never reaches the step, and the N^2 cost is paid
    # EVERY training step (measured 4.7 vs 13-50 ms/batch at 1536 vs 5760,
    # scripts/probe_cluster_tpu.py).
    cluster_device_cap = int(os.environ.get("DENET_TPU_CLUSTER_CAP", "6144"))
    cluster_train_cap = int(os.environ.get("DENET_TPU_CLUSTER_TRAIN_CAP",
                                           "1536"))
    # occlusion-aware quota variant (ops/cluster_device distinct_second):
    # applies to BOTH the training-step sample selection and the serving
    # default (core/model.py reads this attr).  Default off =
    # reference-faithful quota (denet_sparse.cc:210-236).
    cluster_distinct2 = os.environ.get("DENET_TPU_CLUSTER_DISTINCT2",
                                       "0") == "1"

    def _select_samples_device(self, ctx):
        """On-device training sample selection (fused into the train step).

        Reference semantics of get_target (denet_sparse.py:164-206) with the
        corner search, the v2 greedy corner clustering (ops/cluster_device)
        and the random subset/pad/gt-injection all traced: stop-gradient
        corner diffs -> device corner search [-> device clustering] ->
        select_samples.  Requires ctx.aux gt arrays.
        """
        import jax

        from denet_tpu.ops.corner_search_device import corner_search
        from denet_tpu.ops.target_device import select_samples

        diff = jax.lax.stop_gradient(
            ctx.collect[self.corner_layer.layer_index]["corner_diff"])
        if not ctx.train:
            # eval-mode plain forward (e.g. the model-update-bn stats pass,
            # reference denet/model/update_bn.py): inference selection —
            # device corner search [+ v2 clustering], no gt injection.  Same
            # selection as Model.build_full_detect_fn, traced in-layer so a
            # whole-model forward works without a pre-computed sample_bbox.
            if self.nms_threshold < 1.0:
                from denet_tpu.ops.cluster_device import cluster_candidates
                cap = min(10 * self.sample_count, self.cluster_device_cap)
                cand, pr, count = corner_search(
                    diff, self.corner_threshold, self.sample_num,
                    out_count=cap, local_max=self.local_max)
                cand, _pr, _cnt = cluster_candidates(
                    cand, pr, count, self.nms_threshold, self.sample_count,
                    cap, distinct_second=self.cluster_distinct2)
            else:
                cand, _pr, _cnt = corner_search(
                    diff, self.corner_threshold, self.sample_num,
                    local_max=self.local_max)
            return jax.lax.stop_gradient(
                cand.reshape(-1, self.sample_num, self.sample_num, 4))
        assert "gt_bbox" in ctx.aux, \
            "sample_bbox aux input required outside device-target training"
        if self.nms_threshold < 1.0:
            from denet_tpu.ops.cluster_device import cluster_candidates
            cap = min(10 * self.sample_count, self.cluster_train_cap)
            cand, pr, count = corner_search(
                diff, self.corner_threshold, self.sample_num,
                out_count=cap, local_max=self.local_max)
            cand, _pr, count = cluster_candidates(
                cand, pr, count, self.nms_threshold, self.sample_count, cap,
                distinct_second=self.cluster_distinct2)
        else:
            cand, _pr, count = corner_search(
                diff, self.corner_threshold, self.sample_num,
                local_max=self.local_max)
        return jax.lax.stop_gradient(select_samples(
            cand, count, ctx.aux["gt_bbox"], ctx.aux["gt_count"],
            ctx.layer_rng(self.layer_index), self.sample_num,
            self.random_sample, self.sample_gt))

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "DNS":
            return False
        layers.append(DeNetSparseLayer(
            layers, params.get(0, 3), params.get(1, 4), params.get(2, 0.01),
            params.get(3, 0.1), params.get(4, 0), params.get(5, 1.0),
            "G" not in tags))
        return True

    # -- host pipeline -------------------------------------------------------

    def get_samples_arrays(self, model, data_x, train=False,
                           store_shared=False):
        """Run the corner function + native corner search (array results).

        Returns (bbox (B,sn^2,4), pr (B,sn^2), count (B,)).  When
        ``store_shared`` the sample feature map is kept on device
        (model._detect_sample_feat) for the detect phase — replacing the
        reference's sample_shared stash and avoiding its double trunk
        evaluation (denet_sparse.py:117-145).
        """
        import os

        model.ensure_on_device()
        timer = common.Timer()
        # pipelined training passes one-step-stale params for sample
        # selection (Trainer._train_epoch_pipelined)
        params = getattr(model, "_target_params", None)
        state = getattr(model, "_target_state", None)
        if params is None:
            params, state = model.params, model.state

        use_host = os.environ.get("DENET_TPU_HOST_SEARCH", "0") == "1"
        clustering = self.nms_threshold < 1.0

        if use_host:
            # reference-exact path: download the diff map, run the C++ scan/
            # pairing/clustering (1024-corner cap, exact local-max borders)
            key = ("host", train, store_shared)
            if key not in self._corner_fn:
                self._corner_fn[key] = model.build_corner_fn(
                    self.corner_layer.layer_index, train=train,
                    return_sample=store_shared)
            result = self._corner_fn[key](params, state, jnp.asarray(data_x))
            if store_shared:
                model._detect_sample_feat = result[1]
            corner_diff = numpy.asarray(result[0])
            timer.mark()
            arrays = native.build_samples_arrays(
                self.thread_num, corner_diff, self.corner_threshold,
                self.sample_num, self.corner_max, self.local_max,
                self.nms_threshold)
        else:
            # device path: corner pairing on the VPU; only the candidate
            # arrays cross to the host.  With clustering enabled the device
            # returns 10x sample_num^2 candidates and the native greedy
            # clustering redistributes the quota (reference apply_cluster)
            out_count = 10 * self.sample_count if clustering else None
            key = ("dev", train, store_shared, out_count)
            if key not in self._corner_fn:
                logging.verbose("Building device sample function:", key)
                self._corner_fn[key] = model.build_sample_fn(
                    self, train=train, return_sample=store_shared,
                    out_count=out_count)
            result = self._corner_fn[key](params, state, jnp.asarray(data_x))
            if store_shared:
                model._detect_sample_feat = result[1]
            # one packed download: [bbox_flat | pr | count] per image
            packed = numpy.asarray(result[0])
            n = out_count if out_count else self.sample_count
            bbox = packed[:, :n * 4].reshape(packed.shape[0], n, 4)
            pr = packed[:, n * 4:n * 4 + n]
            count = packed[:, -1].astype(numpy.int32)
            timer.mark()
            if clustering:
                bbox, pr, count = native.cluster_samples(
                    bbox, pr, count, self.nms_threshold,
                    10 * self.sample_count, self.sample_count)
            arrays = (bbox, pr, count)

        timer.mark()
        logging.verbose("Took %i ms to get_samples (%i model, %i build)" % (
            timer.current_ms(), timer.delta_ms(0), timer.delta_ms(1)))
        return arrays

    def get_samples(self, model, data_x, train=False, store_shared=False):
        """Tuple-list variant (reference API) used by the training path."""
        return native.samples_to_lists(*self.get_samples_arrays(
            model, data_x, train, store_shared))

    def get_bbox_array(self, sample_bboxs):
        bboxs = numpy.zeros((self.batch_size, self.sample_num, self.sample_num, 4),
                            dtype=numpy.float32)
        for b in range(self.batch_size):
            for i, (_, bbox) in enumerate(sample_bboxs[b]):
                bboxs[b, i // self.sample_num, i % self.sample_num] = bbox
        return bboxs

    def set_samples(self, model, sample_bboxs):
        bboxs = self.get_bbox_array(sample_bboxs)
        model.train_aux["sample_bbox"] = jnp.asarray(bboxs)
        self.sample_bbox_list = sample_bboxs
        return bboxs

    # -- training ------------------------------------------------------------

    def get_target(self, model, data_x, metas):
        """Training-path sample selection (denet_sparse.py:164-206)."""
        sample_bboxs = self.get_samples(model, data_x, train=True)

        total_cover = 0
        total_bbox = 0
        for b, meta in enumerate(metas):
            if len(meta["bbox"]) > 0 and len(sample_bboxs[b]) > 0:
                ov = common.iou_matrix(meta["bbox"],
                                       [s for _, s in sample_bboxs[b]])
                total_cover += int((ov.max(axis=1) > 0.5).sum())
            total_bbox += len(meta["bbox"])

            n = self.sample_count - math.floor(self.random_sample * self.sample_count)
            if len(sample_bboxs[b]) > n:
                sample_bboxs[b] = random.sample(sample_bboxs[b], n)

            while len(sample_bboxs[b]) < self.sample_count:
                x0 = random.uniform(0.0, 1.0)
                y0 = random.uniform(0.0, 1.0)
                x1 = random.uniform(x0, 1.0)
                y1 = random.uniform(y0, 1.0)
                sample_bboxs[b].append((0.0, (x0, y0, x1, y1)))

            if self.sample_gt:
                for index, bbox in enumerate(meta["bbox"]):
                    sample_bboxs[b][-(index + 1)] = (1.0, tuple(bbox))

        if total_bbox > 0:
            logging.verbose("Overall %i/%i (%.2f%%) coverage" % (
                total_cover, total_bbox, 100.0 * total_cover / total_bbox))

        self.set_samples(model, sample_bboxs)
        return None

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"gridSize": self.grid_size, "sampleNum": self.sample_num,
                  "sampleGT": self.sample_gt, "localMax": self.local_max,
                  "cornerThreshold": self.corner_threshold,
                  "randomSample": self.random_sample,
                  "nmsThreshold": self.nms_threshold, "version": self.version})
        return j
