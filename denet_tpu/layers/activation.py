"""Activation layer (`A` desc token) — relu/elu/sigmoid/tanh/softmax/etc.

Reference: denet/layer/activation.py.
"""
import jax
import jax.numpy as jnp

from denet_tpu.layers.base import Layer


def apply_activation(x, activation):
    if activation == "none":
        return x
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation in ("relu", "relu-safe"):
        return jnp.maximum(x, 0.0)
    if activation == "elu":
        return jax.nn.elu(x)
    if activation == "tanh":
        return jnp.tanh(x)
    if activation == "softmax":
        return jax.nn.softmax(x, axis=1)
    if activation == "softplus":
        return jax.nn.softplus(x)
    raise Exception("Unknown activation type: %s" % activation)


class ActivationLayer(Layer):
    type_name = "activation"

    def __init__(self, layers, activation="relu", json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.activation = json_param.get("activation", activation)
        self.output_shape = self.input_shape

    def apply(self, params, state, outputs, ctx):
        return apply_activation(outputs[self.input_index], self.activation), {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "A":
            return False
        layers.append(ActivationLayer(layers, params["activation"]))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"activation": self.activation})
        return j
