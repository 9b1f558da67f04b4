"""Pooling layer (`P` desc token): max / average-include-pad pooling.

Matches reference semantics (denet/layer/pool.py) including the
``ignore_border`` output-shape distinction; implemented with
``lax.reduce_window`` which XLA maps directly onto the TPU vector unit.
"""
import math

import jax
import jax.numpy as jnp

from denet_tpu.layers.base import Layer


class PoolLayer(Layer):
    type_name = "pool"

    def __init__(self, layers, size=(2, 2), stride=None, pad=(0, 0), mode="max",
                 ignore_border=True, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.size = tuple(json_param.get("size", size))
        self.pad = tuple(json_param.get("pad", pad))
        self.ignore_border = json_param.get("ignoreBorder", ignore_border)
        self.mode = json_param.get("mode", mode)
        self.stride = json_param.get("stride", stride)
        if self.stride is None:
            self.stride = self.size
        self.stride = tuple(self.stride)

        ih, iw = self.input_shape[2], self.input_shape[3]
        if self.ignore_border:
            h = int(math.floor((ih + 2 * self.pad[0] - self.size[0]) / self.stride[0])) + 1
            w = int(math.floor((iw + 2 * self.pad[1] - self.size[1]) / self.stride[1])) + 1
        else:
            h = int(math.ceil((ih + 2 * self.pad[0]) / self.stride[0]))
            w = int(math.ceil((iw + 2 * self.pad[1]) / self.stride[1]))
        self.output_shape = (self.input_shape[0], self.input_shape[1], h, w)

        # extra high-side padding so partial edge windows are represented when
        # ignore_border=False
        ph, pw = self.pad
        need_h = (h - 1) * self.stride[0] + self.size[0]
        need_w = (w - 1) * self.stride[1] + self.size[1]
        self._pad_h = (ph, max(ph, need_h - ih - ph))
        self._pad_w = (pw, max(pw, need_w - iw - pw))

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        pad = ((0, 0), (0, 0), self._pad_h, self._pad_w)
        dims = (1, 1, self.size[0], self.size[1])
        strides = (1, 1, self.stride[0], self.stride[1])
        if self.mode == "max":
            init = -jnp.inf
            y = jax.lax.reduce_window(x, init, jax.lax.max, dims, strides, pad)
        elif self.mode in ("average_inc_pad", "average"):
            y = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pad)
            y = y / (self.size[0] * self.size[1])
        else:
            raise Exception("Unknown pool mode: %s" % self.mode)
        return y, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "P":
            return False
        size = (params.get(0), params.get(0))
        stride = (params.get(1, size[0]), params.get(1, size[0]))
        pad = (params.get(2, 0), params.get(2, 0))
        mode = "average_inc_pad" if "A" in tags else "max"
        ignore_border = "B" not in tags
        layers.append(PoolLayer(layers, size, stride, pad, mode, ignore_border))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"mode": self.mode, "size": list(self.size),
                  "stride": list(self.stride), "pad": list(self.pad),
                  "ignoreBorder": self.ignore_border})
        return j
