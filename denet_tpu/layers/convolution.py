"""Convolution layer (`C` desc token).

Semantics match the reference (denet/layer/convolution.py): OIHW weights,
border modes valid/full/half/same/int-pad, He/Xavier init selected by the
``wb`` string, optional bias (``.B`` tag), non-square filters (``.X`` tag).

Note on kernel orientation: Theano's conv2d performs *true convolution*
(kernel spatially flipped) while XLA performs correlation.  To keep the
serialized OIHW weights bit-compatible with reference ``.mdl.gz`` files the
kernel is flipped inside ``apply`` — XLA fuses the reversal into the conv.
"""
import math

import jax
import jax.numpy as jnp
import numpy

from denet_tpu.layers.base import Layer, conv_weight_init, to_f32

_DIMNUMS = ("NCHW", "OIHW", "NCHW")


def conv_output_hw(input_shape, filter_shape, stride, border_mode):
    """Output (h, w) given NCHW input shape and OIHW filter shape.

    Matches reference arithmetic (convolution.py:55-74) — note it indexes
    input_shape[-2]/[-1]; all uses are square so h/w naming is interchangeable.
    """
    ih, iw = input_shape[-2], input_shape[-1]
    kh, kw = filter_shape[2], filter_shape[3]
    if border_mode == "valid":
        h = math.ceil((ih - kh + 1) / stride[0])
        w = math.ceil((iw - kw + 1) / stride[1])
    elif border_mode == "full":
        h = math.ceil((ih + kh - 1) / stride[0])
        w = math.ceil((iw + kw - 1) / stride[1])
    elif border_mode == "half":
        h = math.ceil((ih + 2 * (kh // 2) - kh + 1) / stride[0])
        w = math.ceil((iw + 2 * (kw // 2) - kw + 1) / stride[1])
    elif border_mode == "same":
        assert tuple(stride) == (1, 1)
        h, w = ih, iw
    elif isinstance(border_mode, int):
        h = math.ceil((ih + 2 * border_mode - kh + 1) / stride[0])
        w = math.ceil((iw + 2 * border_mode - kw + 1) / stride[1])
    else:
        raise Exception("Unknown border mode: " + str(border_mode))
    return h, w


def conv_padding(filter_shape, border_mode):
    """Explicit ((lo,hi),(lo,hi)) padding equivalent to each border mode."""
    kh, kw = filter_shape[2], filter_shape[3]
    if border_mode == "valid":
        return ((0, 0), (0, 0))
    if border_mode == "full":
        return ((kh - 1, kh - 1), (kw - 1, kw - 1))
    if border_mode == "half":
        return ((kh // 2, kh // 2), (kw // 2, kw // 2))
    if border_mode == "same":
        # reference: full conv cropped starting at (k-1)//2 (convolution.py:77-80)
        return ((kh - 1 - (kh - 1) // 2, (kh - 1) // 2),
                (kw - 1 - (kw - 1) // 2, (kw - 1) // 2))
    if isinstance(border_mode, int):
        return ((border_mode, border_mode), (border_mode, border_mode))
    raise Exception("Unknown border mode: " + str(border_mode))


class ConvLayer(Layer):
    type_name = "conv"

    def __init__(self, layers, filter_shape=None, filter_stride=(1, 1),
                 use_bias=False, border_mode="half", wb="he-backward",
                 json_param=None):
        super().__init__(layers)
        json_param = json_param or {}

        self.border_mode = json_param.get("border", border_mode)
        self.filter_shape = tuple(json_param.get("shape", filter_shape))
        self.stride = tuple(json_param.get("stride", filter_stride))
        self.use_bias = json_param.get("useBias", use_bias)
        self.enabled = json_param.get("enabled", True)
        self.size = (self.filter_shape[2], self.filter_shape[3])

        w, self.w_bound = conv_weight_init(self.filter_shape, wb)
        self._w_init = w
        self._b_init = numpy.zeros((self.filter_shape[0],), dtype=numpy.float32)

        h, w_out = conv_output_hw(self.input_shape, self.filter_shape,
                                  self.stride, self.border_mode)
        self.output_shape = (self.input_shape[0], self.filter_shape[0], h, w_out)

    def _own_params(self):
        if not self.enabled:
            return {}
        p = {"weight": self._w_init}
        if self.use_bias:
            p["bias"] = self._b_init
        return p

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        w = params["weight"]
        if ctx.compute_dtype is not None:
            if x.dtype != jnp.uint8:    # u8: decode deferred into _s2d_stem
                x = x.astype(ctx.compute_dtype)
            w = w.astype(ctx.compute_dtype)
        # Theano true-convolution == XLA correlation with flipped kernel.
        # Output dtype follows the operands (MXU accumulates f32 internally
        # for bf16 inputs): keeping activations in compute_dtype is what lets
        # the conv transpose in the backward pass see matching dtypes.
        w = jnp.flip(w, axis=(2, 3))
        if self._use_s2d_stem(x):
            y = self._s2d_stem(x, w)
        else:
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=self.stride,
                padding=conv_padding(self.filter_shape, self.border_mode),
                dimension_numbers=_DIMNUMS)
        if self.use_bias:
            y = y + params["bias"][None, :, None, None].astype(y.dtype)
        return y, {}

    def _use_s2d_stem(self, x):
        return self._s2d_eligible(x.shape)

    def _s2d_eligible(self, shape):
        """Space-to-depth rewrite applies to the classic ResNet stem: 7x7
        stride-2 'half' conv on a few input channels with even spatial dims.
        On by default (opt out with DENET_TPU_S2D_STEM=0): the 3-channel
        input uses ~2% of the
        MXU's 128 lanes; in S2D-2 block space the same conv is a 4x4
        stride-1 conv over 4x the channels — measured 2.79 -> 2.25 ms for
        the DeNet trunk stem @512 batch 8 (identical math, bf16
        accumulation-order differences only)."""
        import os
        o, c, kh, kw = self.filter_shape
        return (os.environ.get("DENET_TPU_S2D_STEM", "1") == "1" and
                (kh, kw) == (7, 7) and tuple(self.stride) == (2, 2) and
                self.border_mode == "half" and c <= 4 and
                shape[2] % 2 == 0 and shape[3] % 2 == 0)

    def _s2d_stem(self, x, wf):
        """y = conv7x7/s2(x, wf) computed in space-to-depth-2 block space.

        Derivation: with pad 3, input row m = 2i + t for tap t = a-3 in
        [-3,3]; m = 2(i+qy) + dy with dy = t mod 2, qy = (t-dy)/2 in [-2,1]
        — a 4-tap stride-1 kernel over block rows with pad (2,1).  Writing
        a' = a+1 (one zero-pad row/col at the top-left), a' = 2*ky + dy with
        ky = qy+2, so the tap scatter is exactly pad -> reshape ->
        transpose.  The transform is linear in w: gradients flow to the
        original OIHW weights, so training through this path is valid too.
        """
        b, c, h, w_in = x.shape
        o = wf.shape[0]
        # weights: (O,C,7,7) -> pad to (O,C,8,8) at top/left -> (O, C*4, 4, 4)
        wp = jnp.pad(wf, ((0, 0), (0, 0), (1, 0), (1, 0)))
        wp = wp.reshape(o, c, 4, 2, 4, 2)
        w4 = wp.transpose(0, 1, 3, 5, 2, 4).reshape(o, c * 4, 4, 4)
        # input: (B,C,H,W) -> S2D-2 blocks (B, C*4, H/2, W/2), channel
        # order c*4 + dy*2 + dx to match the weight scatter
        x2 = x.reshape(b, c, h // 2, 2, w_in // 2, 2)
        x2 = x2.transpose(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2,
                                                    w_in // 2)
        if x2.dtype == jnp.uint8:
            # deferred prep_input decode (see Model.prep_input): transpose
            # ran on 1-byte elements; u8 -> float is exact, so this is
            # bitwise-identical to decode-then-transpose.  XLA sometimes
            # hoists the convert+multiply ABOVE the transpose (round-5 HLO
            # audit: the S2D block transpose ran as a bf16 copy, 2x the
            # bytes); the optimization barrier pins the transpose to u8.
            import os
            if os.environ.get("DENET_TPU_S2D_BARRIER", "0") == "1":
                x2 = jax.lax.optimization_barrier(x2)
            x2 = x2.astype(wf.dtype) / 255.0
        return jax.lax.conv_general_dilated(
            x2, w4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=_DIMNUMS)

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "C":
            return False
        use_bias = "B" in tags
        if "X" in tags:
            filter_shape = (params.get(0), layers[-1].output_shape[1],
                            params.get(1), params.get(2))
            filter_stride = (params.get(3, 1), params.get(4, 1))
        else:
            filter_shape = (params.get(0), layers[-1].output_shape[1],
                            params.get(1, 1), params.get(1, 1))
            filter_stride = (params.get(2, 1), params.get(2, 1))
        layers.append(ConvLayer(layers, filter_shape, filter_stride, use_bias,
                                params["borderMode"], params["wb"]))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"shape": list(self.filter_shape),
                  "stride": list(self.stride),
                  "border": self.border_mode,
                  "enabled": self.enabled,
                  "useBias": self.use_bias,
                  "bias": numpy.asarray(params["bias"]) if self.use_bias else None,
                  "weight": numpy.asarray(params["weight"])})
        return j

    def _own_import(self, json_param):
        p = {}
        if self.enabled:
            p["weight"] = to_f32(json_param["weight"])
            if self.use_bias:
                p["bias"] = to_f32(json_param["bias"])
        return p, {}
