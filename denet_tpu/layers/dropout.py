"""Dropout layer (`D` desc token) with inverted scaling.

Reference: denet/layer/dropout.py — binomial mask, scale 1/(1-rate) at train
time, identity at test time.
"""
import jax

from denet_tpu.layers.base import Layer


class DropoutLayer(Layer):
    type_name = "dropout"

    def __init__(self, layers, dropout_rate=0.5, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.dropout_rate = json_param.get("dropoutRate", dropout_rate)
        self.output_shape = self.input_shape

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        if not ctx.train or self.dropout_rate <= 0.0:
            return x, {}
        keep = 1.0 - self.dropout_rate
        mask = jax.random.bernoulli(ctx.layer_rng(self.layer_index), keep, x.shape)
        return x * mask.astype(x.dtype) / keep, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "D":
            return False
        layers.append(DropoutLayer(layers, params.get(0, 0.5)))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"dropoutRate": self.dropout_rate})
        return j
