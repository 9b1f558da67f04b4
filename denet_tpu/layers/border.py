"""Border (zero-pad) layer (`B` desc token).

Reference: denet/layer/border.py — border is (Left, Right, Top, Bottom),
left/right pad the last axis, top/bottom the second-to-last.
"""
import jax.numpy as jnp

from denet_tpu.layers.base import Layer


class BorderLayer(Layer):
    type_name = "border"

    def __init__(self, layers, border=0, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        if isinstance(border, int):
            border = (border, border, border, border)
        elif len(border) == 1:
            border = (border[0],) * 4
        assert len(border) == 4
        self.border = tuple(json_param.get("border", border))

        shape = list(self.input_shape)
        shape[-1] += self.border[0] + self.border[1]
        shape[-2] += self.border[2] + self.border[3]
        self.output_shape = tuple(shape)

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        pad = ((0, 0), (0, 0), (self.border[2], self.border[3]),
               (self.border[0], self.border[1]))
        return jnp.pad(x, pad), {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "B":
            return False
        layers.append(BorderLayer(layers, params.get(0, 0)))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"border": list(self.border)})
        return j
