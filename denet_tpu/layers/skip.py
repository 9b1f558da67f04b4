"""Skip connections across the trunk (`SKIPSRC` / `SKIP` desc tokens).

Reference: denet/layer/skip.py.  SKIPSRC marks a tensor; SKIP later combines
it with the current tensor via 1x1-projection-add or concat.  ``SKIPSRC.X``
additionally acts as a split (remat boundary) in the reference's
multi-execution mode — here it simply sets ``has_split`` which the model
driver turns into a ``jax.checkpoint`` boundary.
"""
import jax.numpy as jnp

from denet_tpu.layers.base import InitialLayer, Layer
from denet_tpu.layers.convolution import ConvLayer


class SkipSrcLayer(Layer):
    type_name = "skip-src"

    def __init__(self, layers, skip_index=0, split=False, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.skip_index = json_param.get("index", skip_index)
        self.has_split = json_param.get("split", split)
        self.output_shape = self.input_shape

    def apply(self, params, state, outputs, ctx):
        return outputs[self.input_index], {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "SKIPSRC":
            return False
        layers.append(SkipSrcLayer(layers, params.get(0, 0), "X" in tags))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"index": self.skip_index, "split": self.has_split})
        return j


class SkipLayer(Layer):
    type_name = "skip"

    def __init__(self, layers, skip_index=0, combine_mode="proj-add",
                 json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.combine_mode = json_param.get("combineMode", combine_mode)
        self.skip_index = json_param.get("index", skip_index)

        self.skip_layer = None
        for layer in layers:
            if layer.type_name == "skip-src" and layer.skip_index == self.skip_index:
                self.skip_layer = layer
                break
        assert self.skip_layer is not None, "SKIP requires a matching SKIPSRC"
        self.skip_src_index = self.skip_layer.layer_index

        x_shape = self.input_shape
        y_shape = self.skip_layer.output_shape

        if self.combine_mode == "proj-add":
            self.output_shape = x_shape
            if y_shape[1] != x_shape[1]:
                subs = [InitialLayer(y_shape)]
                subs.append(ConvLayer(subs, filter_shape=(x_shape[1], y_shape[1], 1, 1)))
                self.sublayers = subs
        elif self.combine_mode == "concat":
            self.output_shape = (x_shape[0], x_shape[1] + y_shape[1],
                                 x_shape[2], x_shape[3])
        else:
            raise Exception("Unknown combine mode: %s" % self.combine_mode)

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        y = outputs[self.skip_src_index]
        if self.combine_mode == "proj-add":
            if self.sublayers:
                outs, new_states = self._apply_sublayers(params, state, y, ctx)
                return x + outs[-1], {"layers": new_states}
            return x + y, {}
        return jnp.concatenate([x, y], axis=1), {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "SKIP":
            return False
        layers.append(SkipLayer(layers, params.get(0, 0)))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"index": self.skip_index, "combineMode": self.combine_mode})
        return j
