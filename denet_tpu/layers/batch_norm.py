"""Spatial batch normalization (`BN` desc token).

Matches reference semantics (denet/layer/batch_norm.py):

* EMAs store mean and **inverse std** (serialized under the key ``"std"``
  which actually holds stdinv — batch_norm.py:109-128).
* EMA momentum 0.9; update uses the *batch* statistics of the current step.
* Test-time normalization converts the stored stdinv back to a variance and
  re-adds eps (mirroring the cudnn-test call with var = (1/stdinv)^2,
  batch_norm.py:50-52), i.e. scale = 1/sqrt((1/stdinv)^2 + eps).
* gamma/beta are classified as "bias" params (no L2 decay — reference
  ``biases()`` returns [omega, beta], batch_norm.py:106-107).

On TPU the whole layer is a handful of VPU ops XLA fuses into neighbouring
convs; no custom kernel needed.
"""
import jax
import jax.numpy as jnp
import numpy

from denet_tpu.layers.base import Layer, to_f32


class BatchNormLayer(Layer):
    type_name = "batchnorm"

    def __init__(self, layers, momentum=0.9, eps=1e-5, renorm_max_r=1.0,
                 renorm_max_d=0.0, renorm_max_it=10, json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.enabled = json_param.get("enabled", True)
        self.momentum = json_param.get("momentum", momentum)
        self.eps = json_param.get("eps", eps)
        self.renorm_max_r = json_param.get("renormMaxR", renorm_max_r)
        self.renorm_max_d = json_param.get("renormMaxD", renorm_max_d)
        self.renorm_max_it = json_param.get("renormMaxIt", renorm_max_it)
        self.output_shape = self.input_shape
        self.channels = self.input_shape[1]

    def _own_params(self):
        if not self.enabled:
            return {}
        return {"gamma": numpy.ones((self.channels,), dtype=numpy.float32),
                "bias": numpy.zeros((self.channels,), dtype=numpy.float32)}

    def _own_state(self):
        if not self.enabled:
            return {}
        return {"mean": numpy.zeros((self.channels,), dtype=numpy.float32),
                "stdinv": numpy.ones((self.channels,), dtype=numpy.float32)}

    def _role_of(self, name):
        return "bias"

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        if not self.enabled:
            return x, {}

        gamma = params["gamma"]
        beta = params["bias"]

        # model-update-bn support: stash this layer's input statistics AND
        # normalize with them (the reference updates layers SEQUENTIALLY —
        # update_bn.py:55-80 measures each layer with every upstream layer
        # already updated — so a one-pass collection must not normalize
        # with the stale EMAs: measured under old stats, the new stats are
        # mutually inconsistent and can destroy the model when drift is
        # large, e.g. after image-size surgery.  Normalizing with the
        # just-measured batch stats makes the single pass self-consistent:
        # each layer's input is produced by upstream layers running on
        # their true current statistics — the "precise BN" recipe, equal to
        # the reference's sequential sweep up to batch-vs-dataset noise.)
        if getattr(ctx, "bn_stats", None) is not None:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 2, 3))
            var = jnp.var(xf, axis=(0, 2, 3))
            ctx.bn_stats[id(self)] = (mean, var)
            scale = gamma * jax.lax.rsqrt(var + self.eps)
            y = (x - mean[None, :, None, None].astype(x.dtype)) * \
                scale[None, :, None, None].astype(x.dtype) + \
                beta[None, :, None, None].astype(x.dtype)
            return y, {}
        if ctx.train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 2, 3)) - jnp.square(mean)
            stdinv = jax.lax.rsqrt(var + self.eps)
            scale = gamma * stdinv
            y = (x - mean[None, :, None, None].astype(x.dtype)) * \
                scale[None, :, None, None].astype(x.dtype) + \
                beta[None, :, None, None].astype(x.dtype)
            m = self.momentum
            new_state = {
                "mean": m * state["mean"] + (1.0 - m) * jax.lax.stop_gradient(mean),
                "stdinv": m * state["stdinv"] + (1.0 - m) * jax.lax.stop_gradient(stdinv),
            }
            return y, new_state

        # test: rebuild variance from stored stdinv, re-add eps (cudnn-test parity)
        var = jnp.square(1.0 / state["stdinv"])
        scale = gamma * jax.lax.rsqrt(var + self.eps)
        y = (x - state["mean"][None, :, None, None].astype(x.dtype)) * \
            scale[None, :, None, None].astype(x.dtype) + \
            beta[None, :, None, None].astype(x.dtype)
        return y, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "BN":
            return False
        layers.append(BatchNormLayer(layers, params.get(0, 0.9),
                                     params.get(1, 1e-5), params.get(2, 1),
                                     params.get(3, 0), params.get(4, 0)))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"momentum": self.momentum,
                  "eps": self.eps,
                  "mean": numpy.asarray(state["mean"]) if self.enabled else None,
                  "std": numpy.asarray(state["stdinv"]) if self.enabled else None,
                  "gamma": numpy.asarray(params["gamma"]) if self.enabled else None,
                  "bias": numpy.asarray(params["bias"]) if self.enabled else None,
                  "renormMaxR": self.renorm_max_r,
                  "renormMaxD": self.renorm_max_d,
                  "renormMaxIt": self.renorm_max_it,
                  "enabled": self.enabled})
        return j

    def _own_import(self, json_param):
        if not self.enabled:
            return {}, {}
        p = {"gamma": to_f32(json_param["gamma"]), "bias": to_f32(json_param["bias"])}
        s = {"mean": to_f32(json_param["mean"]), "stdinv": to_f32(json_param["std"])}
        return p, s


class BatchNormReluLayer(BatchNormLayer):
    """Fused BN+ReLU (`BNA` desc token).

    The reference implements this as a hand-fused CUDA op purely to cut
    activation memory (denet/layer/batch_norm_relu.py:14-58); its gradient
    masks dy by (bn_out > 0) then runs the BN gradient — which is exactly the
    autodiff gradient of relu(bn(x)).  On TPU, XLA fuses relu into the BN
    elementwise chain automatically, so this subclass simply composes the two
    and keeps the distinct type_name for serialization parity.
    """

    type_name = "batchnorm-relu"

    def apply(self, params, state, outputs, ctx):
        y, new_state = super().apply(params, state, outputs, ctx)
        if self.enabled:
            y = jnp.maximum(y, 0.0)
        return y, new_state

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "BNA":
            return False
        layers.append(BatchNormReluLayer(layers, params.get(0, 0.9),
                                         params.get(1, 1e-5)))
        return True
