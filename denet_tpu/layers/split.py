"""Split-execution marker layer (`SPLIT` desc token).

In the reference this cuts the Theano graph into separately-compiled
forward/backward functions chained through shared-variable stashes to reduce
peak graph memory (denet/layer/split.py, model_cnn.py:242-372).  On TPU the
same memory/compute trade is expressed as a rematerialization boundary: the
model driver wraps each inter-split segment in ``jax.checkpoint`` so
activations inside a segment are recomputed during the backward pass instead
of stored.  The layer itself is a pass-through.
"""
from denet_tpu.layers.base import Layer


class SplitLayer(Layer):
    type_name = "split"

    def __init__(self, layers, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.enabled = json_param.get("enabled", True)
        self.has_split = self.enabled
        self.output_shape = self.input_shape

    def apply(self, params, state, outputs, ctx):
        return outputs[self.input_index], {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "SPLIT":
            return False
        layers.append(SplitLayer(layers))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"enabled": self.enabled})
        return j
