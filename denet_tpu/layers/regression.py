"""Final classifier / regression head (`R` desc token).

Reference: denet/layer/regression.py — parse_desc first appends a class_num
KxK "valid" conv collapsing the spatial extent, then this layer which
log-softmaxes over channels and averages probabilities over any remaining
spatial positions.  NLL cost gathers flat log-probabilities by target index.
"""
import jax.numpy as jnp
import numpy

from denet_tpu.layers.base import Layer, log_softmax
from denet_tpu.layers.convolution import ConvLayer


class RegressionLayer(Layer):
    type_name = "regression"

    def __init__(self, layers, use_center=False, valid=None, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        valid = valid or []
        if use_center:
            yc = self.input_shape[-2] // 2
            xc = self.input_shape[-1] // 2
            valid = [(0, yc, xc)]
        self.valid = [tuple(v) for v in json_param.get("valid", valid)]

        if len(self.valid) > 0:
            self.log_pr_shape = (self.input_shape[0], self.input_shape[1],
                                 len(self.valid))
        else:
            self.log_pr_shape = self.input_shape

        self.output_shape = (self.log_pr_shape[0], self.log_pr_shape[1])

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index].astype(jnp.float32)
        if len(self.valid) > 0:
            cols = [x[:, :, off[1], off[2]][:, :, None] for off in self.valid]
            x = jnp.concatenate(cols, axis=2)

        log_pr = log_softmax(x, axis=1)
        ctx.collect[self.layer_index] = {"log_pr": log_pr}

        pr = jnp.exp(log_pr)
        if len(self.log_pr_shape) > 2:
            axes = tuple(range(2, len(self.log_pr_shape)))
            pr = jnp.mean(pr, axis=axes)
        return pr, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "R":
            return False
        use_bias = "B" in tags
        use_center = "C" in tags
        filter_shape = (params["classNum"], layers[-1].output_shape[1],
                        params.get(0, layers[-1].output_shape[2]),
                        params.get(0, layers[-1].output_shape[3]))
        layers.append(ConvLayer(layers, filter_shape, (1, 1), use_bias,
                                "valid", params["wb"]))
        layers.append(RegressionLayer(layers, use_center))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"valid": [list(v) for v in self.valid]})
        return j

    # -- training ------------------------------------------------------------

    def has_cost(self):
        return True

    def target_sizes(self):
        b = self.log_pr_shape[0]
        if len(self.valid) > 0:
            n = b * len(self.valid)
        elif len(self.log_pr_shape) > 2:
            n = b * int(numpy.prod(self.log_pr_shape[2:]))
        else:
            n = b
        return (n, 0)

    def get_target(self, model, data_x, metas):
        yt_index = []
        b_dim = self.log_pr_shape[0]
        cls_dim = self.log_pr_shape[1]
        # multi-host: flat indices encode the GLOBAL batch position; each
        # process builds targets for its local slice at its global offset
        # (set by Trainer.prepare_targets from jax.process_index())
        offset = getattr(model, "target_batch_offset", 0)
        for local_b in range(len(metas)):
            b = local_b + offset
            cls = metas[local_b]["image_class"]
            if len(self.valid) > 0:
                for v in range(len(self.valid)):
                    yt_index.append(numpy.ravel_multi_index(
                        (b, cls, v), self.log_pr_shape))
            elif len(self.log_pr_shape) > 2:
                for y in range(self.log_pr_shape[2]):
                    for x in range(self.log_pr_shape[3]):
                        yt_index.append(numpy.ravel_multi_index(
                            (b, cls, y, x), self.log_pr_shape))
            else:
                yt_index.append(numpy.ravel_multi_index((b, cls), (b_dim, cls_dim)))
        return (numpy.array(yt_index, dtype=numpy.int64),
                numpy.array([], dtype=numpy.float32))

    def cost(self, collect, yt_index, yt_value):
        log_pr = collect["log_pr"].reshape(-1)
        return -jnp.mean(log_pr[yt_index])
