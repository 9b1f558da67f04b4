"""Inverse pooling / nearest-neighbour upsample (`PI` desc token).

The reference ships a custom CUDA kernel for this (denet/layer/pool_inv_op.py)
with a ``tensor.repeat`` fallback; on TPU a plain ``jnp.repeat`` lowers to an
XLA broadcast-reshape that is bandwidth-optimal, and its transpose (the
gradient) lowers to a reduce — no Pallas kernel can beat it, so the repeat IS
the optimized path here.
"""
import jax.numpy as jnp

from denet_tpu.layers.base import Layer


class PoolInvLayer(Layer):
    type_name = "pool-inv"

    def __init__(self, layers, size=(2, 2), json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.size = tuple(json_param.get("size", size))
        b, c, h, w = self.input_shape
        self.output_shape = (b, c, self.size[1] * h, self.size[0] * w)

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        y = jnp.repeat(jnp.repeat(x, self.size[1], axis=2), self.size[0], axis=3)
        return y, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "PI":
            return False
        size = (params.get(0), params.get(0))
        layers.append(PoolInvLayer(layers, size))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"size": list(self.size)})
        return j
