"""Transposed convolution layer (`DC` desc token), border mode "half" only.

Reference: denet/layer/deconvolution.py — implemented there as the gradient
of a forward conv w.r.t. its inputs; here as ``lax.conv_transpose`` on the
OIHW weight (which XLA lowers to the same transposed-conv HLO).
"""
import jax
import numpy

from denet_tpu.layers.base import Layer, conv_weight_init, to_f32


class DeconvLayer(Layer):
    type_name = "deconv"

    def __init__(self, layers, filter_shape=None, filter_stride=(1, 1),
                 use_bias=True, border_mode="half", wb="he-backward",
                 json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.border_mode = json_param.get("border", border_mode)
        self.filter_shape = tuple(json_param.get("shape", filter_shape))
        self.stride = tuple(json_param.get("stride", filter_stride))
        self.use_bias = json_param.get("useBias", use_bias)
        self.size = (self.filter_shape[2], self.filter_shape[3])

        w, self.w_bound = conv_weight_init(self.filter_shape, wb)
        self._w_init = w
        self._b_init = numpy.zeros((self.filter_shape[0],), dtype=numpy.float32)

        if self.border_mode != "half":
            raise Exception("Unknown border mode: " + str(self.border_mode))
        kh, kw = self.filter_shape[2], self.filter_shape[3]
        h = self.input_shape[2] * self.stride[0] - 2 * (kh // 2) + kh - 1
        w_out = self.input_shape[3] * self.stride[1] - 2 * (kw // 2) + kw - 1
        self.output_shape = (self.input_shape[0], self.filter_shape[0], h, w_out)

    def _own_params(self):
        p = {"weight": self._w_init}
        if self.use_bias:
            p["bias"] = self._b_init
        return p

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        # the reference computes grad-of-conv-wrt-input of a stride-s "half"
        # conv (with spatially-flipped true-convolution kernel, channel axes
        # pre-swapped via dimshuffle — deconvolution.py:63-65); the adjoint is
        # a correlation with the raw OIHW kernel over the s-dilated input.
        # Extra (s-1) high-side padding reproduces the reference's declared
        # output size  h*s - 2*(k//2) + k - 1.
        w = params["weight"]
        if ctx.compute_dtype is not None:
            x = x.astype(ctx.compute_dtype)
            w = w.astype(ctx.compute_dtype)
        kh, kw = self.filter_shape[2], self.filter_shape[3]
        sh, sw = self.stride
        pad_h = (kh - 1 - kh // 2, kh - 1 - kh // 2 + sh - 1)
        pad_w = (kw - 1 - kw // 2, kw - 1 - kw // 2 + sw - 1)
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=(pad_h, pad_w),
            lhs_dilation=(sh, sw),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        if self.use_bias:
            y = y + params["bias"][None, :, None, None].astype(y.dtype)
        return y, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "DC":
            return False
        use_bias = "B" not in tags
        if "X" in tags:
            filter_shape = (params.get(0), layers[-1].output_shape[1],
                            params.get(1), params.get(2))
            filter_stride = (params.get(3, 1), params.get(4, 1))
        else:
            filter_shape = (params.get(0), layers[-1].output_shape[1],
                            params.get(1, 1), params.get(1, 1))
            filter_stride = (params.get(2, 1), params.get(2, 1))
        layers.append(DeconvLayer(layers, filter_shape, filter_stride, use_bias,
                                  params["borderMode"], params["wb"]))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"shape": list(self.filter_shape), "stride": list(self.stride),
                  "border": self.border_mode, "useBias": self.use_bias,
                  "bias": numpy.asarray(params["bias"]) if self.use_bias else None,
                  "weight": numpy.asarray(params["weight"])})
        return j

    def _own_import(self, json_param):
        p = {"weight": to_f32(json_param["weight"])}
        if self.use_bias:
            p["bias"] = to_f32(json_param["bias"])
        return p, {}
