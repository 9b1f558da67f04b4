"""DeNet final detection head (`DND` desc token).

Reference: denet/layer/denet_detect.py — 1x1 conv over the sparse-sampled RoI
features producing class scores (+null), optional bbox regression (4ch) and
optional independent-fitness (6ch); the joint-fitness variant scores
class x 5-fitness-bin + null.  Costs: NLL detection, Fast-RCNN smooth-L1 OR
Bounded-IoU bbox cost (arXiv:1711.00164; note the reference's own
"ORIGINAL Paper used 4*dx, proper is 2*dx" correction, denet_detect.py:281),
independent-fitness NLL.  Inference marginalizes joint-fitness scores and
runs per-class NMS / Soft-NMS in the native host extension.
"""
import math

import jax.numpy as jnp
import numpy

import denet_tpu.utils as common
import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import InitialLayer, Layer, log_softmax, smooth_l1
from denet_tpu.layers.convolution import ConvLayer
from denet_tpu.ops import native

# running FPS accounting (reference denet_detect.py:17-19)
detect_time = 0.0
detect_num = 0


class DeNetDetectLayer(Layer):
    type_name = "denet-detect"

    def __init__(self, layers, class_num=10, overlap_threshold=0.5,
                 cost_factor=1.0, bbox_factor=0.0, indfit_factor=0.0,
                 use_jointfit=False, use_bounded_iou=False, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.output_shape = self.input_shape
        self.cost_factor = json_param.get("costFactor", cost_factor)
        self.bbox_factor = json_param.get("bboxFactor", bbox_factor)
        self.class_num = json_param.get("classNum", class_num)
        ot = json_param.get("overlapThreshold", overlap_threshold)
        self.overlap_threshold = (ot, ot) if isinstance(ot, (int, float)) else tuple(ot)

        self.use_jointfit = json_param.get("useJointFitness", use_jointfit)
        self.use_bounded_iou = json_param.get("useBoundedIoU", use_bounded_iou)
        self.indfit_factor = json_param.get("fitnessFactor", indfit_factor)
        self.use_indfit = self.indfit_factor > 0.0
        assert not (self.use_indfit and self.use_jointfit), \
            "Cannot enable both fitness methods at once!"

        self.sparse_layer = common.find_layers(layers, "denet-sparse", False)
        assert self.sparse_layer is not None, \
            "Requires denet-sparse layer before denet-detect layer!"

        self.use_bbox_reg = self.bbox_factor > 0.0
        self.batch_size = self.sparse_layer.batch_size
        self.sample_num = self.sparse_layer.sample_num

        if self.use_jointfit:
            self.fitness_num = 5
            self.null_class = self.class_num * self.fitness_num
            s0 = self.class_num * self.fitness_num + 1
        else:
            self.fitness_num = 6
            self.null_class = self.class_num
            s0 = self.class_num + 1
        self.s0 = s0
        self.s1 = 4 if self.use_bbox_reg else 0
        self.s2 = self.fitness_num if self.use_indfit else 0

        subs = [InitialLayer(self.input_shape)]
        subs.append(ConvLayer(subs, (s0 + self.s1 + self.s2,
                                     self.input_shape[1], 1, 1),
                              (1, 1), True, "valid", 0.0))
        self.sublayers = subs

        self.det_shape = (self.batch_size, s0, self.sample_num, self.sample_num)
        self.indfit_shape = (self.batch_size, self.s2, self.sample_num,
                             self.sample_num)

        self._detect_fn = None
        self._full_fn = {}
        logging.verbose("Adding", self)

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        outs, new_states = self._apply_sublayers(params, state, x, ctx)
        y = outs[-1].astype(jnp.float32)
        s0, s1, s2 = self.s0, self.s1, self.s2

        det_lh = y[:, :s0]
        det_pr = log_softmax(det_lh, axis=1)
        collect = {"det_pr": det_pr}

        # sample bboxes arrive as a device input (aux) or, in fused
        # device-target training, from the sparse layer's on-device selection
        sample_bbox = ctx.aux.get("sample_bbox")
        if sample_bbox is None:
            sample_bbox = ctx.collect.get(
                self.sparse_layer.layer_index, {}).get("sample_bbox")
        if sample_bbox is not None:
            collect["sample_bbox"] = sample_bbox

        if self.use_bbox_reg:
            bbox_reg = y[:, s0:s0 + s1]
            sample_cx = 0.5 * (sample_bbox[..., 0] + sample_bbox[..., 2])
            sample_cy = 0.5 * (sample_bbox[..., 1] + sample_bbox[..., 3])
            sample_w = sample_bbox[..., 2] - sample_bbox[..., 0]
            sample_h = sample_bbox[..., 3] - sample_bbox[..., 1]
            predict_cx = bbox_reg[:, 0] * sample_w + sample_cx
            predict_cy = bbox_reg[:, 1] * sample_h + sample_cy
            predict_w = jnp.exp(bbox_reg[:, 2]) * sample_w
            predict_h = jnp.exp(bbox_reg[:, 3]) * sample_h
            bbox_predict = jnp.stack(
                [predict_cx - predict_w * 0.5, predict_cy - predict_h * 0.5,
                 predict_cx + predict_w * 0.5, predict_cy + predict_h * 0.5],
                axis=-1)
            collect["bbox_reg"] = bbox_reg
            collect["bbox_predict"] = bbox_predict

        if self.use_indfit:
            indfit_lh = y[:, s0 + s1:s0 + s1 + s2]
            collect["indfit_pr"] = log_softmax(indfit_lh, axis=1)

        ctx.collect[self.layer_index] = collect
        return x, {"layers": new_states}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "DND":
            return False
        layers.append(DeNetDetectLayer(
            layers, params.get("classNum"), params.get(0, 0.5),
            params.get(1, 1.0), params.get(2, 0.0), params.get(3, 0.0),
            "J" in tags, "B" in tags))
        return True

    # -- serialization: reference stores only the conv in "layers" -----------

    def export_json(self, params, state):
        j = {"type": self.type_name,
             "layers": [self.sublayers[1].export_json(
                 params["layers"][1], state["layers"][1])]}
        j.update({"costFactor": self.cost_factor, "bboxFactor": self.bbox_factor,
                  "fitnessFactor": self.indfit_factor,
                  "useJointFitness": self.use_jointfit,
                  "useBoundedIoU": self.use_bounded_iou,
                  "classNum": self.class_num,
                  "overlapThreshold": list(self.overlap_threshold)})
        return j

    def import_json(self, json_param):
        conv = self.sublayers[1]
        if "conv" in json_param:        # backward compat (denet_detect.py:129-134)
            cp, cs = conv.import_json(json_param["conv"])
        elif json_param.get("layers"):
            cp, cs = conv.import_json(json_param["layers"][0])
        else:
            cp, cs = conv.init_params(), conv.init_state()
        return ({"layers": [{}, cp]}, {"layers": [{}, cs]})

    # -- training ------------------------------------------------------------

    def has_cost(self):
        return True

    def target_sizes(self):
        n = int(numpy.prod(self.det_shape))
        if self.use_bbox_reg:
            n += self.batch_size * self.sample_num * self.sample_num * 9
        if self.use_indfit:
            n += int(numpy.prod(self.indfit_shape))
        return (0, n)

    def get_target(self, model, data_x, metas):
        sn = self.sample_num
        det_pr = numpy.zeros(self.det_shape, dtype=numpy.float32)
        det_pr[:, self.null_class] = 1.0

        if self.use_bbox_reg:
            bbox_valid = numpy.zeros((self.batch_size, sn, sn), dtype=numpy.float32)
            bbox_reg = numpy.zeros((self.batch_size, 8, sn, sn), dtype=numpy.float32)
            bbox_reg[:, 2] = 1.0
            bbox_reg[:, 3] = 1.0
            bbox_reg[:, 6] = 1.0
            bbox_reg[:, 7] = 1.0

        if self.use_indfit:
            indfit_pr = numpy.zeros(self.indfit_shape, dtype=numpy.float32)
            indfit_pr[:, 0] = 1.0

        for b, meta in enumerate(metas):
            samples = [bbox for _, bbox in self.sparse_layer.sample_bbox_list[b]]
            if len(meta["bbox"]) > 0 and len(samples) > 0:
                overlap = common.iou_matrix(meta["bbox"], samples)
                bbox_indexs, sample_indexs = numpy.where(
                    overlap > self.overlap_threshold[0])
                for obj, index in zip(bbox_indexs.tolist(), sample_indexs.tolist()):
                    si = index % sn
                    sj = index // sn
                    cls = meta["class"][obj]
                    f_rel = (overlap[obj, index] - self.overlap_threshold[0]) / \
                        (1.0 - self.overlap_threshold[0])

                    if self.use_jointfit:
                        f = max(0, min(int(self.fitness_num * f_rel),
                                       self.fitness_num - 1))
                        det_pr[b, cls * self.fitness_num + f, sj, si] = 1.0
                        det_pr[b, self.null_class, sj, si] = 0.0
                    else:
                        det_pr[b, cls, sj, si] = 1.0
                        det_pr[b, self.null_class, sj, si] = 0.0

                    if self.use_indfit:
                        f = 1 + int(math.floor((self.fitness_num - 1) * f_rel))
                        f = max(1, min(f, self.fitness_num - 1))
                        indfit_pr[b, 0, sj, si] = 0.0
                        indfit_pr[b, f, sj, si] = 1.0

                if self.use_bbox_reg:
                    overlap_max = overlap.argmax(axis=0)
                    for index in range(len(samples)):
                        obj = overlap_max[index]
                        if overlap[obj, index] <= self.overlap_threshold[1]:
                            continue
                        sample = samples[index]
                        target = meta["bbox"][obj]
                        si = index % sn
                        sj = index // sn
                        bbox_valid[b, sj, si] = 1.0
                        bbox_reg[b, 0, sj, si] = 0.5 * (target[0] + target[2])
                        bbox_reg[b, 1, sj, si] = 0.5 * (target[1] + target[3])
                        bbox_reg[b, 2, sj, si] = target[2] - target[0]
                        bbox_reg[b, 3, sj, si] = target[3] - target[1]
                        bbox_reg[b, 4, sj, si] = 0.5 * (sample[0] + sample[2])
                        bbox_reg[b, 5, sj, si] = 0.5 * (sample[1] + sample[3])
                        bbox_reg[b, 6, sj, si] = sample[2] - sample[0]
                        bbox_reg[b, 7, sj, si] = sample[3] - sample[1]

        det_pr /= det_pr.sum(axis=1)[:, None]
        if self.use_indfit:
            indfit_pr /= indfit_pr.sum(axis=1)[:, None]

        nfactor = sn * sn
        det_pr /= nfactor
        parts = [det_pr.flatten()]
        if self.use_bbox_reg:
            bbox_valid /= nfactor
            parts += [bbox_valid.flatten(), bbox_reg.flatten()]
        if self.use_indfit:
            indfit_pr /= nfactor
            parts.append(indfit_pr.flatten())

        return (numpy.array([], dtype=numpy.int64),
                numpy.concatenate(parts).astype(numpy.float32))

    def get_errors(self, collect, yt_index, yt_value):
        sn = self.sample_num
        shapes = [self.det_shape]
        if self.use_bbox_reg:
            shapes += [(self.batch_size, sn, sn), (self.batch_size, 8, sn, sn)]
        if self.use_indfit:
            shapes += [self.indfit_shape]

        v = common.ndarray_unpack(yt_value, shapes)
        det_target = v[0]
        index = 1
        bbox_valid = bbox_reg_t = indfit_target = None
        if self.use_bbox_reg:
            bbox_valid, bbox_reg_t = v[index:index + 2]
            index += 2
        if self.use_indfit:
            indfit_target = v[index]
        return self._errors_dense(collect, det_target, bbox_valid, bbox_reg_t,
                                  indfit_target)

    def _errors_dense(self, collect, det_target, bbox_valid, bbox_reg_t,
                      indfit_target):
        det_errors = -jnp.sum(det_target * collect["det_pr"], axis=1) / \
            math.log(self.det_shape[1])

        bbox_errors = None
        if self.use_bbox_reg and self.bbox_factor > 0.0:
            bbox_target = bbox_reg_t[:, 0:4]
            bbox_sample = bbox_reg_t[:, 4:8]
            if self.use_bounded_iou:
                bbox_predict = collect["bbox_predict"]
                target_x = bbox_target[:, 0]
                target_y = bbox_target[:, 1]
                target_w = bbox_target[:, 2]
                target_h = bbox_target[:, 3]
                predict_x = 0.5 * (bbox_predict[..., 0] + bbox_predict[..., 2])
                predict_y = 0.5 * (bbox_predict[..., 1] + bbox_predict[..., 3])
                predict_w = bbox_predict[..., 2] - bbox_predict[..., 0]
                predict_h = bbox_predict[..., 3] - bbox_predict[..., 1]

                dx = target_x - predict_x
                dy = target_y - predict_y
                eps = 0.001
                cost_x = jnp.where(dx >= 0.0, 2 * dx / (target_w + dx + eps),
                                   -2 * dx / (target_w - dx + eps))
                cost_y = jnp.where(dy >= 0.0, 2 * dy / (target_h + dy + eps),
                                   -2 * dy / (target_h - dy + eps))
                cost_w = 1.0 - jnp.minimum(target_w / (predict_w + eps),
                                           predict_w / (target_w + eps))
                cost_h = 1.0 - jnp.minimum(target_h / (predict_h + eps),
                                           predict_h / (target_h + eps))
                cost = jnp.stack([cost_x, cost_y, cost_w, cost_h], axis=1)
                bbox_errors = self.bbox_factor * bbox_valid * \
                    jnp.sum(smooth_l1(cost), axis=1)
            else:
                # standard Fast R-CNN style cost
                tx = (bbox_target[:, 0] - bbox_sample[:, 0]) / bbox_sample[:, 2]
                ty = (bbox_target[:, 1] - bbox_sample[:, 1]) / bbox_sample[:, 3]
                tw = jnp.log(bbox_target[:, 2] / bbox_sample[:, 2])
                th = jnp.log(bbox_target[:, 3] / bbox_sample[:, 3])
                t = jnp.stack([tx, ty, tw, th], axis=1)
                dt = t - collect["bbox_reg"]
                bbox_errors = self.bbox_factor * bbox_valid * \
                    jnp.sum(smooth_l1(dt), axis=1)

        indfit_errors = None
        if self.use_indfit:
            indfit_errors = -jnp.sum(indfit_target * collect["indfit_pr"],
                                     axis=1) / math.log(self.fitness_num)

        return det_errors, bbox_errors, indfit_errors

    def _combine_errors(self, det_errors, bbox_errors, indfit_errors):
        cost = jnp.float32(0.0)
        if det_errors is not None:
            cost += self.cost_factor * jnp.sum(det_errors) / self.batch_size
        if bbox_errors is not None:
            cost += self.bbox_factor * jnp.sum(bbox_errors) / self.batch_size
        if indfit_errors is not None:
            cost += self.indfit_factor * jnp.sum(indfit_errors) / self.batch_size
        return cost

    def cost(self, collect, yt_index, yt_value):
        return self._combine_errors(*self.get_errors(collect, yt_index,
                                                     yt_value))

    # device-target mode: IoU matching + fitness binning on device from the
    # compact gt arrays and the (possibly on-device-selected) sample bboxes
    device_target = True

    def cost_device(self, collect, ctx):
        from denet_tpu.ops import target_device
        sample_bbox = collect["sample_bbox"]
        t = target_device.detect_targets(
            ctx.aux["gt_bbox"], ctx.aux["gt_class"], ctx.aux["gt_count"],
            sample_bbox, self.class_num, self.overlap_threshold,
            self.use_jointfit, self.use_indfit, self.use_bbox_reg,
            self.fitness_num, self.null_class, self.s0)
        return self._combine_errors(*self._errors_dense(
            collect, t["det_pr"], t.get("bbox_valid"), t.get("bbox_reg"),
            t.get("indfit_pr")))

    # -- inference -----------------------------------------------------------

    def detect_outputs(self, collect):
        """Device-side detect outputs (traced) from this layer's collect dict:
        returns dict with det_pr (B,C+1,sn,sn), fitness (B,C+1,sn,sn),
        optional bbox (B,sn,sn,4)."""
        out = {}
        det_pr_full = collect["det_pr"]
        if self.use_jointfit:
            b, sn = self.batch_size, self.sample_num
            det_fit = det_pr_full[:, :self.class_num * self.fitness_num]
            det_fit = det_fit.reshape(b, self.class_num, self.fitness_num, sn, sn)
            det_fit_null = det_pr_full[:, self.null_class]

            m = jnp.max(det_fit, axis=2)
            det_pr = m + jnp.log(jnp.sum(jnp.exp(det_fit - m[:, :, None]), axis=2))
            det_pr = jnp.concatenate([det_pr, det_fit_null[:, None]], axis=1)
            out["det_pr"] = det_pr

            ot = self.overlap_threshold[0]
            val = jnp.asarray([ot + i * (1.0 - ot) / self.fitness_num
                               for i in range(self.fitness_num)], dtype=jnp.float32)
            fitness = jnp.log(jnp.sum(jnp.exp(det_fit) *
                                      val[None, None, :, None, None], axis=2))
            # pad a null channel so fitness matches det_pr layout for the NMS op
            fitness = jnp.concatenate([fitness, det_fit_null[:, None]], axis=1)
            out["fitness"] = fitness
        else:
            out["det_pr"] = det_pr_full
            out["fitness"] = det_pr_full

        if self.use_bbox_reg:
            out["bbox"] = collect["bbox_predict"]
        if self.use_indfit:
            ot = self.overlap_threshold[0]
            val = numpy.array([0.0] + [ot + i * (1.0 - ot) / (self.fitness_num - 1)
                                       for i in range(self.fitness_num - 1)],
                              dtype=numpy.float32)
            fitness_exp = jnp.sum(jnp.exp(collect["indfit_pr"]) *
                                  jnp.asarray(val)[None, :, None, None], axis=1)
            out["fitness"] = out["fitness"] + jnp.log(fitness_exp)[:, None]
        return out

    def get_detections(self, model, data_x, data_m, params):
        global detect_time, detect_num

        pr_threshold = params.get("prThreshold", 0.01)
        nms_threshold = params.get("nmsThreshold", 0.5)
        use_soft_nms = params.get("useSoftNMS", 0) == 1
        logging.verbose("Using detection params - pr threshold: %f, "
                        "nms threshold: %f" % (pr_threshold, nms_threshold))

        # fully-on-device fast path (incl. device soft-NMS and, since round
        # 3, device corner clustering — ops/cluster_device fuses the v2 path
        # into the same single jit).  useDeviceCluster=0 falls back to the
        # host greedy clustering round-trip (parity / debugging).
        use_device = params.get("useDevicePipeline", 1) == 1
        device_cluster = params.get("useDeviceCluster", 1) == 1
        if params.get("useInt8", 0) == 1 and not (
                use_device and self.sparse_layer.nms_threshold >= 1.0):
            raise ValueError(
                "useInt8=1 requires the fused device pipeline "
                "(useDevicePipeline=1 and a non-clustering model); it would "
                "otherwise be silently ignored")
        if use_device and (self.sparse_layer.nms_threshold >= 1.0 or
                           device_cluster):
            return self._get_detections_device(model, data_x, data_m,
                                               pr_threshold, nms_threshold,
                                               params, use_soft_nms)
        if use_device:
            return self._get_detections_clustered(model, data_x, data_m,
                                                  pr_threshold, nms_threshold,
                                                  params, use_soft_nms)

        first_detect = self._detect_fn is None
        if first_detect:
            logging.info("Building detection function")
            self._detect_fn = model.build_detect_fn(self)

        timer = common.Timer()
        bbox_arr, _pr_arr, counts = self.sparse_layer.get_samples_arrays(
            model, data_x, train=False, store_shared=True)
        timer.mark()
        logging.verbose("Found sample bboxs: {}".format(counts.tolist()))

        sn = self.sample_num
        bboxs = bbox_arr.reshape(self.batch_size, sn, sn, 4)
        timer.mark()

        r = self._detect_fn(model.inference_params(), model.state,
                            model._detect_sample_feat, jnp.asarray(bboxs))
        det_pr = numpy.asarray(r["det_pr"])
        fitness = numpy.asarray(r["fitness"])
        if "bbox" in r:
            bboxs = numpy.asarray(r["bbox"])
        timer.mark()

        detlists = native.build_detections_nms(
            pr_threshold, nms_threshold, use_soft_nms, det_pr, fitness, bboxs,
            counts)
        timer.mark()

        logging.verbose("Found detections:", [len(d) for d in detlists])
        logging.verbose("FPS=%.1f, Timing (ms) - get samples: %i, upload: %i, "
                        "classify: %i, build+nms %i" % tuple(
                            [self.batch_size / timer.current()] + timer.deltas_ms()))

        if not first_detect:
            detect_time += timer.current()
            detect_num += self.batch_size
            logging.info("Average FPS=%.1f" % (detect_num / detect_time))

        results = []
        for i, detlist in enumerate(detlists):
            results.append({"detections": detlist, "meta": data_m[i]})
        return results

    def _get_detections_device(self, model, data_x, data_m, pr_threshold,
                               nms_threshold, params, use_soft_nms=False):
        """Single-jit detection path; only the final (B, top_n, 6) detection
        list crosses the host boundary."""
        import jax.numpy as jnp
        from denet_tpu.ops import nms_device
        global detect_time, detect_num

        model.ensure_on_device()
        use_int8 = params.get("useInt8", 0) == 1
        # capCalib=N: self-calibrating serving cluster cap (v2 models) —
        # accumulate the first N serving batches, then derive + install the
        # expected-cost-optimal cap (Model.calibrate_cluster_cap, policy
        # "opt"; pass capPolicy=max for the pessimistic next-pow2 policy).
        # Mirrors the int8 activation-scale calibration pattern; results
        # never depend on the choice (saturation escalates below).
        calib_n = int(params.get("capCalib", 0))
        if (calib_n > 0 and "clusterCap" not in params
                and self.sparse_layer.nms_threshold < 1.0
                and getattr(model, "cluster_cap", None) is None):
            # the accumulator holds at most calib_n-1 host batch copies; if
            # the stream ends before the window completes they stay on the
            # layer until another path installs a cap (cleared below) — an
            # accepted cost of the lazy-calibration design (ADVICE r4)
            self._cap_calib = getattr(self, "_cap_calib", [])[-(calib_n - 1):]
            self._cap_calib.append(numpy.asarray(data_x))
            if len(self._cap_calib) >= calib_n:
                policy = str(params.get("capPolicy", "opt"))
                cap, mx = model.calibrate_cluster_cap(
                    self, self._cap_calib, policy=policy,
                    corner_k=int(params.get("cornerK", 256)))
                self._cap_calib = []
                logging.info(
                    "capCalib: serving cluster cap %d installed (policy %s, "
                    "observed max %d over %d batches)" % (
                        cap, policy, mx, calib_n))
        elif getattr(self, "_cap_calib", None):
            # a cap got installed by another path (batched entry, explicit
            # calibrate_cluster_cap) mid-window: drop the accumulated image
            # copies instead of retaining them for the life of the layer
            self._cap_calib = []
        # clusterCap bounds the candidates entering device corner clustering
        # (v2 models only; default in build_full_detect_fn).  PERF.md: the
        # N^2 clustering cost scales quadratically with the cap while any
        # cap >= the observed candidate count is bitwise lossless, so the
        # default is the calibrated serving cap when present
        # (Model.calibrate_cluster_cap); saturated batches escalate to the
        # reference cap below, so results NEVER depend on the cap choice.
        cluster_cap = int(params.get("clusterCap",
                                     getattr(model, "cluster_cap", None)
                                     or 6144))
        # the sparse layer's clustering attrs are traced into the cached fn
        # at build time, so they belong in the key: occlusion_study-style
        # surgery (set sparse.nms_threshold = 1.0 post-build) must not be
        # served by a stale clustered fn
        key = (pr_threshold, nms_threshold, params.get("cornerK", 256),
               params.get("topM", 128), params.get("topN", 100), use_soft_nms,
               use_int8, cluster_cap,
               getattr(self.sparse_layer, "cluster_distinct2", False),
               self.sparse_layer.nms_threshold,
               self.sparse_layer.corner_threshold,
               self.sparse_layer.local_max)
        # always bound (ADVICE r4): the int8 branch has no saturation guard
        # (the quant fn is built uncapped), and the escalation check below
        # must not rely on boolean short-circuit order for its NameError
        # safety
        guard = False
        if use_int8:
            # int8 PTQ serving (serve/quant.py): self-calibrates activation
            # scales on the first calibBatches serving batches (default 1),
            # hybrid bf16-stem trunk quantization.  CLI: model-predict
            # --predict-mode detect --params useInt8=1,calibBatches=4.
            # The quantized weights are baked from model.params at build
            # time, so the cache is invalidated whenever the params object
            # changes (continued training / checkpoint reload) — otherwise
            # a stale int8 trunk would silently pair with fresh bf16 heads.
            calib_batches = int(params.get("calibBatches", 1))
            cached = self._full_fn.get(key)
            if cached is None or cached[0] is not model.params:
                # amax accumulation window: serve the bf16 path until
                # calib_batches batches have been seen, then freeze scales
                # over ALL of them (an unrepresentative first batch would
                # under-estimate amax and clip every later batch)
                self._int8_calib = getattr(self, "_int8_calib", [])
                self._int8_calib.append(numpy.asarray(data_x))
                if len(self._int8_calib) < calib_batches:
                    logging.info(
                        "int8 calibration: batch %d/%d (serving bf16)" % (
                            len(self._int8_calib), calib_batches))
                    return self._get_detections_device(
                        model, data_x, data_m, pr_threshold, nms_threshold,
                        dict(params, useInt8=0), use_soft_nms)
            first_detect = cached is None or cached[0] is not model.params
            if first_detect:
                if calib_batches == 1:
                    logging.info("int8: single-batch activation calibration "
                                 "in effect (pass calibBatches=N for a "
                                 "representative amax window)")
                logging.info("Building int8-quantized detection function")
                from denet_tpu.serve import quant as quant_mod
                plan, qparams = quant_mod.quantize(model, self._int8_calib)
                self._int8_calib = []
                qfn = quant_mod.build_quant_detect_fn(
                    model, self, plan, pr_threshold, nms_threshold,
                    corner_k=key[2], top_m=key[3], top_n=key[4],
                    use_soft_nms=use_soft_nms)

                def _int8_fn(p, s, x, _qfn=qfn, _qp=qparams):
                    return _qfn(_qp, p, s, x)
                self._full_fn[key] = (model.params, _int8_fn)
            fn = self._full_fn[key][1]
        else:
            # saturation guard: a capped run whose candidate count hits the
            # cap may have dropped candidates the reference cap would keep —
            # return the count alongside and escalate saturated batches
            ref_cap = 10 * self.sparse_layer.sample_num ** 2
            guard = (self.sparse_layer.nms_threshold < 1.0
                     and cluster_cap < ref_cap)
            first_detect = key not in self._full_fn
            if first_detect:
                logging.info("Building fused device detection function")
                self._full_fn[key] = model.build_full_detect_fn(
                    self, pr_threshold, nms_threshold, corner_k=key[2],
                    top_m=key[3], top_n=key[4], use_soft_nms=use_soft_nms,
                    cluster_cap=cluster_cap, return_cand_count=guard)
            fn = self._full_fn[key]

        timer = common.Timer()
        outs = fn(model.inference_params(), model.state,
                  jnp.asarray(data_x))
        dets = outs[0]
        if not use_int8 and guard:
            # the fused fn packs the pre-clustering candidate count into a
            # final sentinel det row (build_full_detect_fn), so detections
            # AND the saturation check cost ONE device->host transfer —
            # a separate count read doubled per-batch latency on the link
            packed = numpy.asarray(dets)
            cand_max = int(packed[:, -1, 1].max())
            if cand_max >= cluster_cap:
                logging.info(
                    "cluster cap %d saturated (count %d); escalating batch "
                    "to reference cap %d" % (cluster_cap, cand_max, ref_cap))
                return self._get_detections_device(
                    model, data_x, data_m, pr_threshold, nms_threshold,
                    dict(params, clusterCap=ref_cap), use_soft_nms)
            dets = packed[:, :-1]
        detlists = nms_device.dets_to_lists(dets)   # one host transfer
        timer.mark()

        logging.verbose("Found detections:", [len(d) for d in detlists])
        logging.verbose("FPS=%.1f (device pipeline, %i ms/batch)" % (
            self.batch_size / timer.current(), timer.current_ms()))
        if not first_detect:
            detect_time += timer.current()
            detect_num += self.batch_size
            logging.info("Average FPS=%.1f" % (detect_num / detect_time))

        return [{"detections": detlist, "meta": data_m[i]}
                for i, detlist in enumerate(detlists)]

    def _get_detections_clustered(self, model, data_x, data_m, pr_threshold,
                                  nms_threshold, params, use_soft_nms=False):
        """v2 path: device corner search -> host greedy clustering -> fused
        device detect+NMS.  Host transfers: candidate arrays down, clustered
        bboxes up, final detections down."""
        import jax.numpy as jnp
        from denet_tpu.ops import nms_device
        global detect_time, detect_num

        model.ensure_on_device()
        key = ("clustered", pr_threshold, nms_threshold,
               params.get("topM", 128), params.get("topN", 100), use_soft_nms)
        first_detect = key not in self._full_fn
        if first_detect:
            logging.info("Building clustered detection functions")
            self._full_fn[key] = model.build_detect_nms_fn(
                self, pr_threshold, nms_threshold, top_m=key[3], top_n=key[4],
                use_soft_nms=use_soft_nms)
        fn = self._full_fn[key]

        timer = common.Timer()
        bbox_arr, _pr, counts = self.sparse_layer.get_samples_arrays(
            model, data_x, train=False, store_shared=True)
        sn = self.sample_num
        bboxs = bbox_arr.reshape(self.batch_size, sn, sn, 4)
        dets, _ = fn(model.inference_params(), model.state, model._detect_sample_feat,
                     jnp.asarray(bboxs), jnp.asarray(counts))
        detlists = nms_device.dets_to_lists(dets)
        timer.mark()

        logging.verbose("Found detections:", [len(d) for d in detlists])
        if not first_detect:
            detect_time += timer.current()
            detect_num += self.batch_size
            logging.info("Average FPS=%.1f" % (detect_num / detect_time))

        return [{"detections": detlist, "meta": data_m[i]}
                for i, detlist in enumerate(detlists)]

    def get_detections_batched(self, model, batches, params,
                               defer_downloads=False, stage_batches=1):
        """Pipelined multi-batch detection over the fused device path.

        ``batches`` iterates (data_x, data_m) pairs.  JAX dispatch is async,
        so batch k+1's upload and compute overlap with the host-side result
        conversion of batch k — the steady-state rate is bounded by
        max(device step, host conversion), not their sum.

        ``defer_downloads=True`` accumulates the per-batch detection arrays
        on device and drains them in ONE stacked transfer at the end.  On the
        axon remote-TPU link the first device->host read permanently degrades
        upload bandwidth ~30x, so a streaming loop must stay download-free;
        this is the deployment-serving pattern (results flushed per window).

        ``stage_batches=G`` uploads G batches in one host->device transfer
        and computes them as G model-batch steps from device slices —
        amortizes the link's ~90ms per-transfer overhead without changing
        the model's batch size.
        """
        import jax.numpy as jnp
        from denet_tpu.ops import nms_device
        global detect_time, detect_num

        pr_threshold = params.get("prThreshold", 0.01)
        nms_threshold = params.get("nmsThreshold", 0.5)
        use_soft_nms = params.get("useSoftNMS", 0) == 1
        if params.get("useInt8", 0) == 1:
            raise ValueError("useInt8 is not supported by the batched "
                             "detection path; use get_detections")
        use_device = (params.get("useDevicePipeline", 1) == 1 and
                      (self.sparse_layer.nms_threshold >= 1.0 or
                       params.get("useDeviceCluster", 1) == 1))
        if not use_device:
            results = []
            for data_x, data_m in batches:
                results += self.get_detections(model, data_x, data_m, params)
            return results

        model.ensure_on_device()
        # capCalib=N upfront on the batched path: materialize the first N
        # batches, calibrate + install the serving cap, then serve them
        # (same knob as _get_detections_device; the recursive staged call
        # skips re-calibration because model.cluster_cap is then set)
        calib_n = int(params.get("capCalib", 0))
        if (calib_n > 0 and "clusterCap" not in params
                and self.sparse_layer.nms_threshold < 1.0
                and getattr(model, "cluster_cap", None) is None):
            import itertools
            batches = iter(batches)
            head = list(itertools.islice(batches, calib_n))
            if head:
                policy = str(params.get("capPolicy", "opt"))
                cap, mx = model.calibrate_cluster_cap(
                    self, [x for x, _ in head], policy=policy,
                    corner_k=int(params.get("cornerK", 256)))
                logging.info(
                    "capCalib: serving cluster cap %d installed (policy %s, "
                    "observed max %d over %d batches)" % (
                        cap, policy, mx, len(head)))
            batches = itertools.chain(head, batches)
        # same cache key layout as _get_detections_device (the batched path
        # always uses the bf16 pipeline; int8 flag kept for key parity).
        # clusterCap follows the calibrated serving default; saturation
        # escalation happens at conversion/drain time (the hot loop itself
        # stays download-free): a batch whose candidate count hits the cap
        # re-runs through a lazily-built reference-cap fn, so results never
        # depend on the cap choice.
        cluster_cap = int(params.get("clusterCap",
                                     getattr(model, "cluster_cap", None)
                                     or 6144))
        ref_cap = 10 * self.sparse_layer.sample_num ** 2
        guard = (self.sparse_layer.nms_threshold < 1.0
                 and cluster_cap < ref_cap)
        key = (pr_threshold, nms_threshold, params.get("cornerK", 256),
               params.get("topM", 128), params.get("topN", 100), use_soft_nms,
               False, cluster_cap,
               getattr(self.sparse_layer, "cluster_distinct2", False),
               self.sparse_layer.nms_threshold,
               self.sparse_layer.corner_threshold,
               self.sparse_layer.local_max)
        if key not in self._full_fn:
            logging.info("Building fused device detection function")
            self._full_fn[key] = model.build_full_detect_fn(
                self, pr_threshold, nms_threshold, corner_k=key[2],
                top_m=key[3], top_n=key[4], use_soft_nms=use_soft_nms,
                cluster_cap=cluster_cap, return_cand_count=guard)
        fn = self._full_fn[key]

        def esc_fn():
            # reference-cap escalation fn, cached in self._full_fn under the
            # same key layout the device path uses (clusterCap=ref_cap,
            # guard off) so later calls — batched or single — never pay the
            # multi-minute remote recompile again
            esc_key = key[:7] + (ref_cap,) + key[8:]
            if esc_key not in self._full_fn:
                logging.info(
                    "cluster cap %d saturated; building reference-cap "
                    "(%d) escalation fn" % (cluster_cap, ref_cap))
                self._full_fn[esc_key] = model.build_full_detect_fn(
                    self, pr_threshold, nms_threshold, corner_k=key[2],
                    top_m=key[3], top_n=key[4],
                    use_soft_nms=use_soft_nms, cluster_cap=ref_cap)
            return self._full_fn[esc_key]

        def detlists_for(dets, data_x):
            # ONE device->host transfer: the guarded fn packs the candidate
            # count into a sentinel det row (build_full_detect_fn)
            arr = numpy.asarray(dets)
            if guard:
                if int(arr[:, -1, 1].max()) >= cluster_cap:
                    dets2 = esc_fn()(model.inference_params(), model.state,
                                     jnp.asarray(data_x))[0]
                    arr = numpy.asarray(dets2)
                else:
                    arr = arr[:, :-1]
            return nms_device.dets_to_lists(arr)

        if stage_batches > 1:
            def staged(src):
                group = []
                for item in src:
                    group.append(item)
                    if len(group) == stage_batches:
                        yield group
                        group = []
                if group:
                    yield group

            def regrouped():
                bs = model.batch_size
                for group in staged(batches):
                    stacked = numpy.concatenate([x for x, _ in group], axis=0)
                    xg = jnp.asarray(stacked)                  # ONE upload
                    for i, (_, data_m) in enumerate(group):
                        yield xg[i * bs:(i + 1) * bs], data_m

            return self.get_detections_batched(model, regrouped(), params,
                                               defer_downloads, 1)

        results = []
        timer = common.Timer()
        n_images = 0
        if defer_downloads:
            # bound retention: with the guard on, each deferred batch holds
            # its input alive for a possible escalation re-run — on device
            # when staged (HBM!), host RAM otherwise — so drain every
            # drainChunk batches (default 64) instead of once at the end.
            # Without the guard only the small (B, top_n, 6) dets are
            # retained.
            drain_chunk = (int(params.get("drainChunk", 64)) if guard
                           else (1 << 30))
            acc = []

            def drain():
                # plain per-batch transfers (no new ops -> no compiles);
                # every upload/compute above was already dispatched async.
                # saturation escalation (rare, guard only) happens here,
                # outside the dispatch loop
                for dets, dx, dm in acc:
                    dl = detlists_for(dets, dx)
                    results.extend({"detections": d, "meta": m}
                                   for d, m in zip(dl, dm))
                acc.clear()

            for data_x, data_m in batches:
                xj = jnp.asarray(data_x)                       # async upload
                outs = fn(model.inference_params(), model.state, xj)  # async
                acc.append((outs[0], data_x if guard else None, data_m))
                n_images += len(data_m)
                if len(acc) >= drain_chunk:
                    drain()
            drain()
        else:
            pending = None  # (dets_device, data_x, data_m)
            for data_x, data_m in batches:
                xj = jnp.asarray(data_x)                       # async upload
                outs = fn(model.inference_params(), model.state, xj)  # async
                if pending is not None:
                    detlists = detlists_for(*pending[:2])
                    results += [{"detections": dl, "meta": m}
                                for dl, m in zip(detlists, pending[2])]
                pending = (outs[0], data_x if guard else None, data_m)
                n_images += len(data_m)
            if pending is not None:
                detlists = detlists_for(*pending[:2])
                results += [{"detections": dl, "meta": m}
                            for dl, m in zip(detlists, pending[2])]

        dt = timer.current()
        if n_images:
            logging.info("Pipelined detection: %.1f images/sec (%i images)" % (
                n_images / dt, n_images))
            detect_time += dt
            detect_num += n_images
        return results
