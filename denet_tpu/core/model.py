"""Model core: desc-DSL construction, functional forward, JSON v3 I/O.

TPU-native counterpart of the reference ModelCNN (denet/model/model_cnn.py).
Differences in mechanism, parity in capability:

* the layer graph is a list of static-config layer objects; compute is a pure
  ``forward(params, state, x, ctx)`` evaluated under one ``jax.jit``,
* SPLIT / SKIPSRC.X layers become ``jax.checkpoint`` (remat) boundaries
  instead of separately-compiled graph fragments — same peak-memory effect,
  single fused XLA program,
* the ``.mdl.gz`` gzip-JSON v3 model format round-trips byte-compatibly.
"""
import random
import time

import jax
import jax.numpy as jnp
import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import Ctx, InitialLayer

# Executables must stay alive for the life of the process: on the axon
# remote-TPU runtime, freeing a compiled executable permanently degrades the
# host->device transfer path (measured 17ms -> 650ms for a 25MB upload).
# Every jitted function the model creates is registered here.
_FN_KEEPALIVE = []


def _keepalive(fn):
    _FN_KEEPALIVE.append(fn)
    return fn


class Model:
    def __init__(self):
        self.batch_size = 0
        self.iteration = 0
        self.class_labels = None
        self.data_shape = None
        self.class_num = 0
        self.rng_seed = random.randint(1, 9999)

        self.gradient_clip = 0.0
        self.skip_layer_updates = []
        self.bias_decay = False
        self.layers = []
        self.distort_mode = []
        self.model_desc = None
        self.fname = None
        self.use_split_mode = False
        # optional low-precision trunk compute (jnp.bfloat16 feeds the MXU at
        # double rate; accumulation stays f32 via preferred_element_type)
        self.compute_dtype = None

        # parameter / state pytrees (lists parallel to self.layers)
        self.params = None
        self.state = None

        # extra device inputs for the next train step (e.g. sample bboxes set
        # by DeNetSparseLayer.get_target) and the stashed inference-time
        # sample feature map (device array)
        self.train_aux = {}
        self._detect_sample_feat = None

        # cached jitted functions
        self._predict_fn = None
        self._on_device = False
        # cache of the pre-cast inference param tree, keyed on (params object
        # identity, mutation version).  In-place mutation of param leaves
        # (params[i]["weight"] = ...) keeps the identity unchanged, so any
        # code that mutates leaves MUST call invalidate_cached_params().
        self._inference_params = None   # (identity, version, cast copy)
        self._params_version = 0

    # -- shapes --------------------------------------------------------------

    def get_input_shape(self):
        assert self.data_shape is not None, "Data shape hasn't been set!"
        return tuple([self.batch_size] + list(self.data_shape))

    def get_output_shape(self):
        return self.layers[-1].output_shape

    def get_parameter_num(self):
        leaves = jax.tree_util.tree_leaves(self.params)
        return int(sum(numpy.prod(l.shape) for l in leaves))

    # -- construction --------------------------------------------------------

    def build_layer(self, layer_desc, layers, activation, border_mode, wb):
        """Parse one ``TYPE.TAGS[P0,P1,...]`` token (model_cnn.py:122-145)."""
        from denet_tpu.layers.registry import layer_types

        p_start = layer_desc.find("[")
        p_end = layer_desc.find("]")
        layer_params = {"classNum": self.class_num, "activation": activation,
                        "borderMode": border_mode, "wb": wb}
        if p_start > 0 and p_end > p_start:
            layer_type = layer_desc[:p_start]
            for i, p in enumerate(layer_desc[(p_start + 1):p_end].split(",")):
                layer_params[i] = common.convert_num(p)
        else:
            layer_type = layer_desc

        t_index = layer_type.find(".")
        if t_index > 0:
            layer_tags = layer_type[(t_index + 1):]
            layer_type = layer_type[:t_index]
        else:
            layer_tags = ""

        for layer in layer_types:
            if layer.parse_desc(layers, layer_type, layer_tags, layer_params):
                return
        raise Exception("Invalid layer - type: %s tags: %s params: %s" % (
            layer_type, layer_tags, layer_params))

    def build(self, model_desc, data_shape, activation="relu",
              border_mode="valid", weight_init=("he-forward",)):
        weight_init = list(weight_init)
        self.model_desc = " ".join(model_desc)
        self.data_shape = tuple(data_shape)
        self.layers = [InitialLayer(self.get_input_shape())]
        for i, layer_desc in enumerate(model_desc):
            wb = weight_init[min(len(weight_init) - 1, i)]
            self.build_layer(layer_desc, self.layers, activation, border_mode, wb)

        self.params = [layer.init_params() for layer in self.layers]
        self.state = [layer.init_state() for layer in self.layers]
        self.use_split_mode = any(l.has_split for l in self.layers)
        logging.verbose("Number of parameters in model: %d" % self.get_parameter_num())

    def ensure_on_device(self):
        """Device-put params/state once so repeated jit calls don't re-upload
        the weights (numpy leaves are transferred on every call otherwise —
        ~85MB/step for DeNet-34 through a remote-TPU link)."""
        if self.params is not None and not self._on_device:
            self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
            self.state = jax.tree_util.tree_map(jnp.asarray, self.state)
            self._on_device = True

    def invalidate_cached_params(self):
        """Drop caches derived from self.params after IN-PLACE leaf mutation.

        Replacing self.params with a new tree is detected automatically (the
        inference-params cache is identity-keyed); assigning into existing
        dicts (params[i]["weight"] = ...) is not — call this afterwards or
        predict/detect paths silently serve stale weights (and
        ensure_on_device would skip re-uploading the mutated leaves)."""
        self._params_version += 1
        self._inference_params = None
        self._on_device = False

    def inference_params(self):
        """Params with conv/deconv "weight" leaves pre-cast to compute_dtype.

        ConvLayer.apply casts w to ctx.compute_dtype inside the trace; with
        f32 master weights that cast runs EVERY step of the fused detection
        pipeline (the optimized HLO shows ~11% of estimated cycles in weight
        converts — the 1536x4706 wide detect-head weight alone ~1.3M cycles).
        Pre-casting once is bitwise-identical (the conv sees the same bf16
        value) and removes the per-step converts.  BN leaves keep f32 (gamma*
        stdinv folds in f32).  Training keeps f32 masters — this is for the
        detect/predict paths only."""
        if self.compute_dtype is None:
            return self.params
        if self._inference_params is not None and \
                self._inference_params[0] is self.params and \
                self._inference_params[1] == self._params_version:
            return self._inference_params[2]
        dt = self.compute_dtype

        def cast(path, leaf):
            key = path[-1]
            name = getattr(key, "key", getattr(key, "name", None))
            if name == "weight" and hasattr(leaf, "dtype") and \
                    leaf.dtype == jnp.float32:
                return jnp.asarray(leaf, dtype=dt)
            return leaf

        cast_params = jax.tree_util.tree_map_with_path(cast, self.params)
        self._inference_params = (self.params, self._params_version, cast_params)
        return cast_params

    # -- forward -------------------------------------------------------------

    def segments(self, use_remat):
        """Layer index ranges [(start, end)); split layers open a new segment."""
        if not (use_remat and self.use_split_mode):
            return [(1, len(self.layers))]
        points = [0]
        for i, layer in enumerate(self.layers):
            if layer.has_split:
                points.append(i)
        points.append(len(self.layers))
        return [(points[i] + 1, points[i + 1] + 1) for i in range(len(points) - 1)
                if points[i] + 1 < min(points[i + 1] + 1, len(self.layers) + 1)]

    def prep_input(self, x, ctx):
        """uint8 image batches decode to [0,1] on device (4x less host->device
        traffic than float32 — the deployment-realistic input format).

        When the first layer is the S2D-eligible stem conv, the uint8 tensor
        passes through untouched and the conv decodes AFTER its
        space-to-depth transpose — the transpose then moves 1-byte elements
        instead of 2-byte bf16 (measured 2.50 -> 2.27 ms for the stem @512
        b8; bitwise-identical since u8->bf16 is exact and decode is
        elementwise)."""
        if x.dtype == jnp.uint8:
            first = self.layers[1] if len(self.layers) > 1 else None
            if first is not None and first.type_name == "conv" and \
                    getattr(first, "_use_s2d_stem", None) and \
                    first._use_s2d_stem(x):
                return x
            return x.astype(ctx.compute_dtype or jnp.float32) / 255.0
        return x

    def forward(self, params, state, x, ctx, use_remat=None):
        """Returns (outputs, new_state); ctx.collect filled with cost tensors.

        ``outputs`` is a dict keyed by layer index (0 = model input) so that
        partial forwards (corner / detect phases) compose with skip layers.
        """
        if use_remat is None:
            use_remat = ctx.train
        outputs = {0: self.prep_input(x, ctx)}
        new_state = [{}] + [None] * (len(self.layers) - 1)

        segments = self.segments(use_remat)
        remat = use_remat and self.use_split_mode and len(segments) > 1
        for (start, end) in segments:
            end = min(end, len(self.layers))
            new_keys = list(range(start, end))

            def seg_fn(seg_params, seg_state, outs_dict, _start=start, _end=end):
                seg_ctx = Ctx(train=ctx.train, rng=ctx.rng, epoch=ctx.epoch,
                              iteration=ctx.iteration, aux=ctx.aux,
                              compute_dtype=ctx.compute_dtype,
                              bn_stats=ctx.bn_stats)
                outs = dict(outs_dict)
                ns_list = []
                for i in range(_start, _end):
                    y, ns = self.layers[i].apply(seg_params[i - _start],
                                                 seg_state[i - _start],
                                                 outs, seg_ctx)
                    outs[i] = y
                    ns_list.append(ns if ns else seg_state[i - _start])
                return {k: outs[k] for k in range(_start, _end)}, ns_list, \
                    seg_ctx.collect

            seg_call = jax.checkpoint(seg_fn) if remat else seg_fn
            new_outs, ns_list, collect = seg_call(
                params[start:end], state[start:end], outputs)
            outputs.update(new_outs)
            for k, ns in zip(new_keys, ns_list):
                new_state[k] = ns
            ctx.collect.update(collect)

        return outputs, new_state

    def forward_range(self, params, state, start, seed_outputs, ctx):
        """Apply layers[start:] given seeded earlier outputs (partial forward,
        used for the detect phase which starts after the corner layer)."""
        outputs = dict(seed_outputs)
        new_state = list(state)
        for i in range(start, len(self.layers)):
            y, ns = self.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
            new_state[i] = ns if ns else state[i]
        return outputs, new_state

    # -- detection-phase functions -------------------------------------------

    def build_corner_fn(self, corner_index, train=False, return_sample=False):
        """Jitted partial forward through the corner layer: returns
        (corner_pr[, sample_feat]).  Replaces the reference's separately
        compiled corner_func (denet_sparse.py:117-145); keeping sample_feat on
        device removes its inference-time double trunk evaluation."""

        def corner(params, state, x, rng):
            ctx = Ctx(train=train, rng=rng, compute_dtype=self.compute_dtype)
            outputs = {0: self.prep_input(x, ctx)}
            for i in range(1, corner_index + 1):
                y, _ = self.layers[i].apply(params[i], state[i], outputs, ctx)
                outputs[i] = y
            collect = ctx.collect[corner_index]
            # ship only the per-position diff d = log pr_f - log pr_t (== 2z,
            # see DeNetCornerLayer.apply): the host search needs nothing else
            # and it halves the transfer
            corner_diff = collect["corner_diff"]
            if return_sample:
                return corner_diff, collect["sample"]
            return (corner_diff,)

        fn = _keepalive(jax.jit(corner))
        rng_holder = {"key": jax.random.PRNGKey(self.rng_seed + 7919)}

        def call(params, state, x):
            rng_holder["key"], sub = jax.random.split(rng_holder["key"])
            return fn(params, state, x, sub)

        return call

    def build_sample_fn(self, sparse_layer, train=False, return_sample=False,
                        out_count=None, corner_k=256):
        """Jitted corner phase + DEVICE corner search: returns
        (bbox, pr, count[, sample_feat]).  Only the small candidate arrays
        cross to the host (vs downloading the full diff map for the C++
        search) and the pairing runs on the VPU instead of the single host
        CPU."""
        from denet_tpu.ops.corner_search_device import corner_search

        corner_index = sparse_layer.corner_layer.layer_index

        def run(params, state, x, rng):
            ctx = Ctx(train=train, rng=rng, compute_dtype=self.compute_dtype)
            outputs = {0: self.prep_input(x, ctx)}
            for i in range(1, corner_index + 1):
                y, _ = self.layers[i].apply(params[i], state[i], outputs, ctx)
                outputs[i] = y
            collect = ctx.collect[corner_index]
            diff = collect["corner_diff"]
            bbox, pr, count = corner_search(
                diff, sparse_layer.corner_threshold, sparse_layer.sample_num,
                corner_k=corner_k, out_count=out_count,
                local_max=sparse_layer.local_max)
            # pack (bbox, pr, count) into ONE array: a single host download
            # instead of three (each read costs a full link RTT)
            b = bbox.shape[0]
            packed = jnp.concatenate(
                [bbox.reshape(b, -1), pr,
                 count[:, None].astype(jnp.float32)], axis=1)
            if return_sample:
                return packed, collect["sample"]
            return (packed,)

        fn = _keepalive(jax.jit(run))
        rng_holder = {"key": jax.random.PRNGKey(self.rng_seed + 104729)}

        def call(params, state, x):
            rng_holder["key"], sub = jax.random.split(rng_holder["key"])
            return fn(params, state, x, sub)

        return call

    def build_full_detect_fn(self, detect_layer, pr_threshold, nms_threshold,
                             corner_k=256, top_m=128, top_n=100,
                             use_soft_nms=False, cluster_cap=None,
                             return_cand_count=False):
        """ONE jitted function for the whole detection inference step:
        trunk + corner head -> device corner search [-> device corner
        clustering for v2 models] -> sparse RoI gather + detect head ->
        device per-class NMS -> top-N detections.

        The reference pipeline crossed the host boundary four times per batch
        (corner download, sample upload, det download, NMS) — here the only
        transfers are the image upload and the ~20KB detection list download.
        ``cluster_cap`` bounds the candidates entering device clustering
        (the N^2 adjacency of ops/cluster_device; the reference's host cap
        is 10*sample_count, 23040 for the wide config — a 530MB bitmap).
        ``None`` resolves to ``self.cluster_cap`` when set (the calibrated
        serving cap from calibrate_cluster_cap) else the legacy 6144
        default.  ``return_cand_count=True`` PACKS the pre-clustering
        candidate count into one extra sentinel det row (row top_n:
        score=+1.0, cls slot = count — dets_to_lists ignores sentinel
        rows) so guarded callers read detections AND the count in a single
        device->host transfer, detect cap saturation (count >= cap) and
        escalate to the reference cap.
        """
        from denet_tpu.ops import nms_device
        from denet_tpu.ops.corner_search_device import corner_search

        sparse = detect_layer.sparse_layer
        corner_index = sparse.corner_layer.layer_index
        sn = sparse.sample_num
        clustering = sparse.nms_threshold < 1.0
        if cluster_cap is None:
            cluster_cap = getattr(self, "cluster_cap", None) or 6144

        def run(params, state, x):
            ctx = Ctx(train=False, compute_dtype=self.compute_dtype)
            outputs = {0: self.prep_input(x, ctx)}
            for i in range(1, corner_index + 1):
                y, _ = self.layers[i].apply(params[i], state[i], outputs, ctx)
                outputs[i] = y
            collect = ctx.collect[corner_index]
            diff = collect["corner_diff"]

            if clustering:
                from denet_tpu.ops.cluster_device import cluster_candidates
                cap = min(10 * sn * sn, cluster_cap)
                bbox_c, pr_c, count_c = corner_search(
                    diff, sparse.corner_threshold, sn, corner_k,
                    out_count=cap, local_max=sparse.local_max)
                bbox, pr, count = cluster_candidates(
                    bbox_c, pr_c, count_c, sparse.nms_threshold, sn * sn,
                    cap, distinct_second=getattr(sparse, "cluster_distinct2",
                                                 False))
                cand_count = count_c
            else:
                bbox, pr, count = corner_search(diff, sparse.corner_threshold,
                                                sn, corner_k,
                                                local_max=sparse.local_max)
                cand_count = count
            bbox4 = bbox.reshape(-1, sn, sn, 4)

            ctx2 = Ctx(train=False, compute_dtype=self.compute_dtype,
                       aux={"sample_feat": collect["sample"],
                            "sample_bbox": bbox4})
            self.forward_range(params, state, corner_index + 1,
                               {corner_index: None}, ctx2)
            outs = detect_layer.detect_outputs(
                ctx2.collect[detect_layer.layer_index])
            final_bbox = outs.get("bbox", bbox4)
            dets, det_count = nms_device.nms(
                outs["det_pr"], outs["fitness"], final_bbox, count,
                pr_threshold=pr_threshold, nms_threshold=nms_threshold,
                top_m=top_m, top_n=top_n, use_soft_nms=use_soft_nms)
            if return_cand_count:
                extra = jnp.zeros((dets.shape[0], 1, dets.shape[2]),
                                  dets.dtype)
                extra = extra.at[:, 0, 0].set(1.0)   # +1.0 score sentinel
                extra = extra.at[:, 0, 1].set(cand_count.astype(dets.dtype))
                return jnp.concatenate([dets, extra], axis=1), det_count
            return dets, det_count

        return _keepalive(jax.jit(run))

    def calibrate_cluster_cap(self, detect_layer, batches, margin=1.25,
                              policy="max", corner_k=256):
        """Measure pre-clustering candidate counts on representative batches
        and derive + install the serving cluster cap (``self.cluster_cap``).
        Returns (cap, max_count).

        ``policy="max"`` is ops/cluster_device.auto_cap (next pow2 >=
        margin*max — every calibration batch fits, escalation only fires on
        distribution shift).  ``policy="opt"`` is auto_cap_opt: the
        expected-cost argmin over the measured per-batch count distribution,
        where rare crowded batches escalate to the reference cap at serve
        time instead of taxing every batch with their quadratic adjacency
        (lossless either way — see the escalation guards in denet_detect).
        "opt" additionally times the counting prefix on batches[0] to
        estimate the cap-independent pipeline floor.  Per-batch maxima and
        the chosen policy land in ``self.cluster_cap_stats``.

        The counting jit runs only trunk + corner head + corner search at
        the reference-faithful cap (10*sample_count — denet_sparse.cc's
        admission bound), so counts below it are exact.  One-time
        calibration cost, standard serving practice (the int8 path already
        calibrates activation scales the same way).

        ``corner_k`` must match the serving pipeline's cornerK (more
        corners per type -> more candidate pairs): callers pass the same
        value they serve with.  The installed cap is per-model, not
        per-cornerK — a process serving several cornerK values keeps exact
        results via escalation but should recalibrate for the larger k."""
        from denet_tpu.ops.cluster_device import auto_cap, auto_cap_opt
        from denet_tpu.ops.corner_search_device import corner_search

        sparse = detect_layer.sparse_layer
        assert sparse.nms_threshold < 1.0, \
            "cluster-cap calibration applies to v2 (clustering) models only"
        corner_index = sparse.corner_layer.layer_index
        sn = sparse.sample_num
        ref_cap = 10 * sn * sn

        def run(params, state, x):
            ctx = Ctx(train=False, compute_dtype=self.compute_dtype)
            outputs = {0: self.prep_input(x, ctx)}
            for i in range(1, corner_index + 1):
                y, _ = self.layers[i].apply(params[i], state[i], outputs,
                                            ctx)
                outputs[i] = y
            diff = ctx.collect[corner_index]["corner_diff"]
            _, _, count = corner_search(
                diff, sparse.corner_threshold, sn, corner_k,
                out_count=ref_cap, local_max=sparse.local_max)
            return count

        fn = _keepalive(jax.jit(run))
        params = self.inference_params()
        batches = list(batches)
        batch_maxima = []
        for x in batches:
            counts = numpy.asarray(fn(params, self.state, jnp.asarray(x)))
            batch_maxima.append(int(counts.max()))
        max_count = max(batch_maxima)
        stats = {"policy": policy, "batch_maxima": batch_maxima,
                 "margin": margin, "corner_k": corner_k}
        if policy == "opt":
            import time as _time
            xj = jnp.asarray(batches[0])
            batch = int(xj.shape[0])
            # settle AND drain before t0 — an async settle dispatch left in
            # the queue executes inside the timed window, inflating t_prefix
            # ~25% (5 executions over 4 iters) and biasing the argmin to
            # larger caps
            numpy.asarray(fn(params, self.state, xj))
            t0 = _time.time()
            iters = 4
            for _ in range(iters):
                c_ = fn(params, self.state, xj)
            numpy.asarray(c_)                     # drain the exec queue
            t_prefix = (_time.time() - t0) / iters
            cap = auto_cap_opt(batch_maxima, sn * sn, batch, t_prefix,
                               margin)
            stats["t_prefix_ms"] = round(t_prefix * 1e3, 3)
        else:
            cap = auto_cap(max_count, sn * sn, margin)
        stats["cap"] = cap
        self.cluster_cap = cap
        self.cluster_cap_stats = stats
        return cap, max_count

    def build_detect_nms_fn(self, detect_layer, pr_threshold, nms_threshold,
                            top_m=128, top_n=100, use_soft_nms=False):
        """Jitted detect phase + device NMS, fed the stashed sample feature
        map + (host-clustered) sample bboxes.  Used by the corner-clustering
        (v2) inference path where the candidate selection round-trips the
        host; everything else stays on device."""
        from denet_tpu.ops import nms_device

        sparse_layer = detect_layer.sparse_layer
        corner_index = sparse_layer.corner_layer.layer_index
        sn = sparse_layer.sample_num

        def run(params, state, sample_feat, sample_bbox, count):
            ctx = Ctx(train=False, compute_dtype=self.compute_dtype,
                      aux={"sample_feat": sample_feat,
                           "sample_bbox": sample_bbox})
            self.forward_range(params, state, corner_index + 1,
                               {corner_index: None}, ctx)
            outs = detect_layer.detect_outputs(
                ctx.collect[detect_layer.layer_index])
            final_bbox = outs.get("bbox", sample_bbox)
            return nms_device.nms(outs["det_pr"], outs["fitness"], final_bbox,
                                  count, pr_threshold=pr_threshold,
                                  nms_threshold=nms_threshold, top_m=top_m,
                                  top_n=top_n, use_soft_nms=use_soft_nms)

        return _keepalive(jax.jit(run))

    def build_detect_fn(self, detect_layer):
        """Jitted detect phase: layers after the corner layer, fed the stashed
        sample feature map + sample bboxes; returns detection outputs."""
        sparse_layer = detect_layer.sparse_layer
        corner_index = sparse_layer.corner_layer.layer_index

        def detect(params, state, sample_feat, sample_bbox):
            ctx = Ctx(train=False, compute_dtype=self.compute_dtype,
                      aux={"sample_feat": sample_feat,
                           "sample_bbox": sample_bbox})
            seed = {corner_index: None}
            self.forward_range(params, state, corner_index + 1, seed, ctx)
            return detect_layer.detect_outputs(ctx.collect[detect_layer.layer_index])

        return _keepalive(jax.jit(detect))

    # -- cost ----------------------------------------------------------------

    def cost_layers(self):
        return [l for l in self.layers if l.has_cost()]

    def loss(self, params, state, x, targets, ctx, cost_factors=None,
             use_remat=None):
        """Total cost = sum(factor_i * cost_i); returns (total, (costs, new_state))."""
        outputs, new_state = self.forward(params, state, x, ctx,
                                          use_remat=use_remat)
        clayers = self.cost_layers()
        factors = cost_factors if cost_factors else [1.0] * len(clayers)
        assert len(factors) == len(clayers)
        total = jnp.float32(0.0)
        costs = []
        device_targets = "gt_bbox" in ctx.aux
        ti = 0
        for k, layer in enumerate(clayers):
            if device_targets and getattr(layer, "device_target", False):
                # target built on device inside this jit (ops/target_device)
                c = layer.cost_device(ctx.collect[layer.layer_index], ctx)
            else:
                c = layer.cost(ctx.collect[layer.layer_index],
                               targets[ti], targets[ti + 1])
                ti += 2
            costs.append(c)
            total = total + jnp.float32(factors[k]) * c
        return total, (costs, new_state)

    def get_targets(self, data_x, metas, device_targets=False):
        """Host-side target generation for every cost layer (ordered).

        With ``device_targets`` the layers that build their targets on device
        are skipped (including the sparse layer's host sample selection when
        the fused device selection applies)."""
        targets = []
        for layer in self.layers:
            if device_targets and getattr(layer, "device_target", False):
                continue
            if device_targets and layer.type_name == "denet-sparse":
                continue    # fused on-device selection inside the step
                # (incl. v2 clustering since round 3 — ops/cluster_device)
            t = layer.get_target(self, data_x, metas)
            if t is not None:
                targets += list(t)
        return targets

    # -- prediction ----------------------------------------------------------

    def predict_output_step(self, data_x):
        self.ensure_on_device()
        if self._predict_fn is None:
            logging.info("Building predict function")

            def predict(params, state, x):
                ctx = Ctx(train=False, compute_dtype=self.compute_dtype)
                outputs, _ = self.forward(params, state, x, ctx, use_remat=False)
                return outputs[len(self.layers) - 1]

            self._predict_fn = _keepalive(jax.jit(predict))
        return numpy.asarray(self._predict_fn(self.inference_params(), self.state,
                                              jnp.asarray(data_x)))

    def predict_output(self, dataset):
        import math
        dataset_x, dataset_m, dataset_size = dataset.export(self.batch_size)
        timer = common.Timer()
        n = math.ceil(dataset_size / self.batch_size)
        pr = []
        for index in range(n):
            data_x = dataset_x[index * self.batch_size:(index + 1) * self.batch_size]
            pr.append(self.predict_output_step(data_x))
        pr = numpy.concatenate(pr, axis=0)
        logging.verbose("Prediction took %.3f sec for %i samples" % (
            timer.current(), pr.shape[0]))
        if (dataset_size % self.batch_size) != 0:
            pr = pr[:dataset_size]
        return pr

    def predict_custom(self, dataset, output_func, output_shape):
        """Evaluate an arbitrary per-batch output function over a dataset
        (reference model_cnn.py:514-539)."""
        import math
        dataset_x, _dataset_y, dataset_size = dataset.export(self.batch_size)
        n = math.ceil(dataset_size / self.batch_size)
        shape = tuple([n * output_shape[0]] + list(output_shape)[1:])
        result = numpy.zeros(shape, dtype=numpy.float32)
        for index in range(n):
            data_x = dataset_x[index * self.batch_size:(index + 1) * self.batch_size]
            data_y = output_func(data_x)
            result[index * output_shape[0]:(index + 1) * output_shape[0]] = \
                numpy.asarray(data_y)
        if (dataset_size % self.batch_size) != 0:
            result = result[:dataset_size]
        return result

    def predict_label(self, dataset):
        pr = self.predict_output(dataset)
        assert pr.ndim == 2
        return [int(numpy.argmax(pr[i])) for i in range(pr.shape[0])]

    # -- serialization (JSON v3) ---------------------------------------------

    def export_json(self):
        json_layers = []
        for index in range(1, len(self.layers)):
            json_layers.append(self.layers[index].export_json(
                self.params[index], self.state[index]))

        from time import gmtime, strftime
        import getpass
        json_obj = {"classifierType": "CNN",
                    "classLabels": self.class_labels,
                    "classNum": self.class_num,
                    "dataShape": list(self.data_shape),
                    "date": strftime("%Y-%m-%d %H:%M:%S", gmtime()),
                    "user": getpass.getuser(),
                    "version": 3,
                    "layers": json_layers}
        return json_obj

    def import_json(self, json_obj, layer_range=None):
        if json_obj.get("version", 0) == 0:
            raise Exception("Old format model file detected, no compatibility!")

        self.class_labels = json_obj["classLabels"]
        if "imageSize" in json_obj and "imageMode" in json_obj:
            width, height = json_obj["imageSize"][0], json_obj["imageSize"][1]
            mode = json_obj.get("imageMode", "RGB")
            self.data_shape = ({"RGB": 3, "L": 1}[mode], width, height)
        elif "dataShape" in json_obj:
            self.data_shape = tuple(json_obj["dataShape"])
        else:
            raise AssertionError("Bad mdl file, cannot determine input data shape!")

        self.class_num = json_obj.get("classNum", len(self.class_labels))

        json_layers = json_obj["layers"]
        if layer_range is None:
            layer_start, layer_end = 0, len(json_layers)
        elif isinstance(layer_range, tuple):
            layer_start, layer_end = layer_range[0], min(len(json_layers), layer_range[1])
        elif isinstance(layer_range, int):
            layer_start, layer_end = 0, min(len(json_layers), layer_range)
        else:
            raise Exception("Unknown layer range format: %s" % (layer_range,))

        from denet_tpu.layers.registry import layer_types
        self.layers = [InitialLayer(self.get_input_shape())]
        # re-import into an existing Model replaces the whole tree: drop every
        # params-derived cache so predict/detect can't serve the old weights
        self.invalidate_cached_params()
        self._predict_fn = None
        self.params = [{}]
        self.state = [{}]
        for layer_json in json_layers[layer_start:layer_end]:
            layer = None
            for layer_type in layer_types:
                if layer_json["type"] == layer_type.type_name:
                    layer = layer_type(self.layers, json_param=layer_json)
                    break
            assert layer is not None, "Unknown layer type: " + layer_json["type"]
            p, s = layer.import_json(layer_json)
            self.layers.append(layer)
            self.params.append(p)
            self.state.append(s)

        self.use_split_mode = any(l.has_split for l in self.layers)
        logging.info("Number of parameters in model: %d" % self.get_parameter_num())


# -- module-level helpers (reference model_cnn.py:24-77) ---------------------

def load_from_json(json_obj, batch_size=32, layer_range=None):
    model = Model()
    model.batch_size = batch_size
    model.import_json(json_obj, layer_range)
    return model


def load_from_file(fname, batch_size=32, layer_range=None):
    t = time.time()
    logging.info("Loading model from %s" % fname)
    model = load_from_json(common.json_from_gz(fname), batch_size, layer_range)
    model.fname = fname
    logging.verbose("Loading model took %.2f sec" % (time.time() - t))
    return model


def save_to_file(model, fname, compresslevel=9):
    logging.info("Saving model to %s" % fname)
    t = time.time()
    common.json_to_gz(fname, model.export_json(), compresslevel)
    logging.verbose("Saving model took %.2f sec" % (time.time() - t))


def initialize(args, data_shape, class_labels, class_num):
    """Build a model from CLI args (reference model_cnn.py:46-77)."""
    if args.model is None:
        logging.info("Building convolutional model (%i classes)..." % class_num)
        model = Model()
        model.batch_size = args.batch_size
        model.class_labels = class_labels
        model.class_num = class_num

        try:
            n = int(args.border_mode)
            border_mode = n
        except ValueError:
            border_mode = args.border_mode

        model.build(args.model_desc, data_shape, args.activation, border_mode,
                    list(args.weight_init))
    else:
        model = load_from_file(args.model, args.batch_size)
        model.class_labels = class_labels
        model.class_num = class_num
        assert tuple(data_shape) == tuple(model.data_shape), \
            "Mismatching data shapes in .mdl and data: %s != %s" % (
                data_shape, model.data_shape)

    model.skip_layer_updates = args.skip_layer_updates
    if len(model.skip_layer_updates) > 0:
        logging.info("Skipping layer updates:", model.skip_layer_updates)
    return model
