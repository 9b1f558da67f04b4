"""DeNet corner distribution layer (`DNC` desc token).

Reference: denet/layer/denet_corner.py — a pass-through layer with a side
head: 1x1 conv producing ``corner_num`` corner logits (4, or 5 with ``.C``
center corners) plus ``sample_feat`` RoI-classifier feature channels.  The
corner logit c is expanded to a 2-way (not-corner / corner) log-softmax via
[c, -c].  Corner-head weights init to 0 with bias 5.0 so training starts from
"no corners anywhere" (denet_corner.py:42-47).

Targets are dense corner "probability" heatmaps built from ground-truth bbox
corners, normalized by W*H*corner_num; cost is cross-entropy / log(2).
"""
import math

import jax.numpy as jnp
import numpy

import denet_tpu.utils.logging as logging
from denet_tpu.layers.base import InitialLayer, Layer, log_softmax
from denet_tpu.layers.convolution import ConvLayer


class DeNetCornerLayer(Layer):
    type_name = "denet-corner"

    def __init__(self, layers, sample_feat=512, cost_factor=1, dropout=0.0,
                 use_center=False, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.output_shape = self.input_shape
        self.batch_size, self.features, self.height, self.width = self.input_shape

        self.sample_feat = json_param.get("sampleFeat", sample_feat)
        self.cost_factor = json_param.get("costFactor", cost_factor)
        self.use_center = json_param.get("useCenter", use_center)
        self.dropout = json_param.get("dropout", dropout)

        self.corner_num = 5 if self.use_center else 4
        subs = [InitialLayer(self.input_shape)]
        subs.append(ConvLayer(subs, (self.corner_num + self.sample_feat,
                                     self.features, 1, 1), (1, 1), True, "valid"))
        # corner channels start at "everything is background"
        subs[-1]._w_init[:self.corner_num] = 0.0
        subs[-1]._b_init[:self.corner_num] = 5.0
        self.sublayers = subs

        self.corner_shape = (self.batch_size, 2, self.corner_num,
                             self.height, self.width)
        self.sample_shape = (self.batch_size, self.sample_feat,
                             self.height, self.width)
        logging.verbose("Adding", self)

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        outs, new_states = self._apply_sublayers(params, state, x, ctx)
        y = outs[-1].astype(jnp.float32)

        z = y[:, :self.corner_num]
        corner_lh = jnp.stack([z, -z], axis=1)
        corner_pr = log_softmax(corner_lh, axis=1)
        sample = y[:, self.corner_num:]

        # The corner search consumes only d = corner_pr[:,0] - corner_pr[:,1]
        # = log_softmax([z,-z])[0] - [1] = z - (-z) = 2z: the logsumexp
        # cancels EXACTLY, so inference paths read this precomputed diff and
        # XLA dead-code-eliminates the whole exp/log tree from the fused
        # detect jit (round-5 HLO audit: ~15% of estimated wide-model
        # cycles).  corner_pr stays collected for the training cost.
        # DENET_TPU_CORNER_DIFF=0 restores the legacy recomputation (A/B).
        import os
        if os.environ.get("DENET_TPU_CORNER_DIFF", "1") == "0":
            corner_diff = corner_pr[:, 0] - corner_pr[:, 1]
        else:
            corner_diff = z + z
        ctx.collect[self.layer_index] = {"corner_pr": corner_pr,
                                         "corner_diff": corner_diff,
                                         "sample": sample}
        return x, {"layers": new_states}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "DNC":
            return False
        layers.append(DeNetCornerLayer(layers, params.get(0, 512),
                                       params.get(1, 1.0), params.get(2, 0.0),
                                       "C" in tags))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"sampleFeat": self.sample_feat, "useCenter": self.use_center,
                  "costFactor": self.cost_factor, "dropout": self.dropout})
        return j

    # -- training ------------------------------------------------------------

    def has_cost(self):
        return True

    def target_sizes(self):
        return (0, int(numpy.prod(self.corner_shape)))

    def get_target(self, model, data_x, metas):
        corner_pr = numpy.zeros(self.corner_shape, dtype=numpy.float32)
        w, h = self.width, self.height
        for b, meta in enumerate(metas):
            for bbox in meta["bbox"]:
                x0 = int(round(bbox[0] * w))
                y0 = int(round(bbox[1] * h))
                x1 = max(x0, int(round(bbox[2] * w)) - 1)
                y1 = max(y0, int(round(bbox[3] * h)) - 1)
                x0v = 0 <= x0 < w
                y0v = 0 <= y0 < h
                x1v = 0 <= x1 < w
                y1v = 0 <= y1 < h
                if x0v and y0v:
                    corner_pr[b, 1, 0, y0, x0] = 1.0
                if x1v and y0v:
                    corner_pr[b, 1, 1, y0, x1] = 1.0
                if x0v and y1v:
                    corner_pr[b, 1, 2, y1, x0] = 1.0
                if x1v and y1v:
                    corner_pr[b, 1, 3, y1, x1] = 1.0
                if self.use_center:
                    cx = int(round((bbox[0] + bbox[2]) * 0.5 * w))
                    cy = int(round((bbox[1] + bbox[3]) * 0.5 * h))
                    if 0 <= cx < w and 0 <= cy < h:
                        corner_pr[b, 1, 4, cy, cx] = 1.0

        corner_pr[:, 0] = 1.0 - corner_pr[:, 1]
        corner_pr /= w * h * self.corner_num

        # target dropout (denet_corner.py:117-120)
        if self.dropout > 0.0:
            mask = numpy.random.binomial(
                1, 1.0 - self.dropout,
                (self.corner_shape[0], self.corner_shape[2],
                 self.corner_shape[3], self.corner_shape[4])).astype(numpy.float32)
            corner_pr *= mask[:, None] / (1.0 - self.dropout)

        return (numpy.array([], dtype=numpy.int64), corner_pr.flatten())

    def cost(self, collect, yt_index, yt_value):
        return self._cost_dense(collect, yt_value.reshape(self.corner_shape))

    def _cost_dense(self, collect, target):
        corner_cost = -jnp.mean(jnp.sum(target * collect["corner_pr"],
                                        axis=(1, 2, 3, 4))) / math.log(2)
        return self.cost_factor * corner_cost

    # device-target mode: build the dense heatmap on device from the compact
    # gt arrays inside the SAME jit as the forward/backward pass
    device_target = True

    def cost_device(self, collect, ctx):
        from denet_tpu.ops import target_device
        rng = (ctx.layer_rng(self.layer_index) if self.dropout > 0.0 else None)
        target = target_device.corner_target(
            ctx.aux["gt_bbox"], ctx.aux["gt_count"], self.height, self.width,
            self.use_center, dropout=(self.dropout if ctx.train else 0.0),
            rng=rng)
        return self._cost_dense(collect, target)
