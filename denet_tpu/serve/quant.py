"""int8 post-training-quantization serving mode for the detection pipeline.

The fused detection pipeline is HBM-bandwidth-bound (PERF.md: 5.49 GB
touched per batch-of-8 at 82% of v5e peak), so halving activation bytes is
the remaining large serving lever; the v5e MXU also runs int8 matmuls at
2x bf16 rate (measured 1.97x on the 16-block trunk stack incl. realistic
per-channel requantization — PERF.md round 2).

This module quantizes the maximal supported *trunk prefix* of a model
(stem conv+BN+ReLU, max-pool, original-design ResNet blocks incl.
bottleneck and projection shortcuts, skip-src taps) to int8 activations
with:

* per-output-channel symmetric int8 weights (scale = amax/127),
* per-tensor activation scales from data calibration (amax over batches),
* BatchNorm folded into the per-channel requantization affine,
* ReLU folded into the [0,127] requantization clamp (post-ReLU tensors are
  non-negative, so the int8 codes use the unsigned half-range),
* the uint8 input consumed directly as a zero-point-128 quantized tensor
  (x/255 == (x_i8 + 128)/255), the zero-point correction folded into the
  bias via 128 * sum(w_q),
* max-pool running natively on int8 codes (max commutes with the
  monotonic quantization map),
* residual adds on int8 CODES at the block-output scale (each addend is
  independently rounded/saturated to +-127 first) — every tensor
  materialized between fusions stays 1 byte; the extra addend-saturation
  error vs an f32 add is bounded by one code per operand and measured
  at <0.002 mAP on the flagship.

Everything after the quantized prefix (decoder convs, skip joins, corner /
detect heads, corner search, NMS) runs in the normal bf16 path; skip-src
intermediates needed by later skip layers are dequantized taps.

No reference counterpart (the reference serves f32 through cuDNN,
denet/layer/convolution.py); this is a TPU-native serving addition.
"""
import jax
import jax.numpy as jnp
import numpy

from denet_tpu.core.model import Ctx, _keepalive
from denet_tpu.layers.convolution import conv_padding

_DN = ("NCHW", "OIHW", "NCHW")


# -- region planning ---------------------------------------------------------

def plan_region(model):
    """Walk the layer list from 1 and return (ops, end_index, tap_indices)
    for the longest quantizable prefix.  Each op is a static descriptor;
    array data is packed later by ``quantize``."""
    ops = []
    taps = []
    layers = model.layers
    i = 1
    end = 0
    n = len(layers)
    while i < n:
        l = layers[i]
        t = l.type_name
        if t == "conv":
            if (i + 2 < n and getattr(l, "enabled", True)
                    and layers[i + 1].type_name == "batchnorm"
                    and layers[i + 1].enabled
                    and layers[i + 2].type_name == "activation"
                    and layers[i + 2].activation == "relu"):
                ops.append({"kind": "conv", "conv": i, "bn": i + 1,
                            "out": i + 2})
                end = i + 2
                i += 3
                continue
            break
        if t == "pool" and l.mode == "max":
            ops.append({"kind": "pool", "index": i, "out": i})
            end = i
            i += 1
            continue
        if t == "resnet":
            if not (l.version == "original" and l.activation == "relu"
                    and l.bn_json_param.get("enabled", True)):
                break
            ops.append({"kind": "block", "index": i, "out": i})
            end = i
            i += 1
            continue
        if t == "skip-src":
            ops.append({"kind": "tap", "index": i, "out": i})
            taps.append(i)
            end = i
            i += 1
            continue
        break
    # the region must end on a quantized tensor (trim trailing taps is fine —
    # a tap is identity); require at least the stem + one block
    if sum(1 for o in ops if o["kind"] in ("conv", "block")) < 2:
        raise ValueError("model trunk not quantizable (region too short)")
    return ops, end, taps


def _block_structure(layer):
    """Static structure of an original-design resnet block's sublayers:
    (main conv sublayer indices, proj conv index or None, proj bn index)."""
    subs = layer.sublayers
    main_convs = [k for k in range(1, layer._main_index + 1)
                  if subs[k].type_name == "conv"]
    for k in main_convs:
        assert subs[k + 1].type_name == "batchnorm", "conv without BN"
    proj_conv = proj_bn = None
    if layer._shortcut_index:
        si = layer._shortcut_index
        if subs[si].type_name == "batchnorm":
            proj_conv, proj_bn = si - 1, si
        else:
            proj_conv = si
        assert subs[proj_conv].type_name == "conv"
    return main_convs, proj_conv, proj_bn


# -- calibration -------------------------------------------------------------

def _amax(x):
    return jnp.max(jnp.abs(x.astype(jnp.float32)))


def build_calib_fn(model, ops, end, in_index=None):
    """Jitted f32 forward over the region returning the activation amax at
    every quantization point (keys are stable per-op strings)."""

    def calib(params, state, x):
        ctx = Ctx(train=False, compute_dtype=jnp.float32)
        outputs = {0: model.prep_input(x, ctx)}
        for i in range(1, end + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        res = {}
        if in_index is not None:
            res["region_in"] = _amax(outputs[in_index])
        for k, op in enumerate(ops):
            if op["kind"] == "conv":
                res["op%d" % k] = _amax(outputs[op["out"]])
            elif op["kind"] == "block":
                l = model.layers[op["index"]]
                outs, _ = l._apply_sublayers(params[op["index"]],
                                             state[op["index"]],
                                             outputs[l.input_index], ctx)
                main_convs, _, _ = _block_structure(l)
                for j, ci in enumerate(main_convs[:-1]):
                    res["op%d_s%d" % (k, j)] = _amax(outs[ci + 2])
                res["op%d" % k] = _amax(outputs[op["index"]])
        return res

    return _keepalive(jax.jit(calib))


# -- packing -----------------------------------------------------------------

def _bn_affine(bn_layer, params, state):
    """Inference-time BN as y = a*x + b (same math as BatchNormLayer.apply
    test path: var rebuilt from stored stdinv, eps re-added)."""
    gamma = numpy.asarray(params["gamma"], numpy.float32)
    beta = numpy.asarray(params["bias"], numpy.float32)
    mean = numpy.asarray(state["mean"], numpy.float32)
    stdinv = numpy.asarray(state["stdinv"], numpy.float32)
    var = numpy.square(1.0 / stdinv)
    a = gamma / numpy.sqrt(var + bn_layer.eps)
    b = beta - mean * a
    return a, b


def _quant_weight(w):
    """Per-output-channel symmetric int8: returns (w_q, sw)."""
    w = numpy.asarray(w, numpy.float32)
    sw = numpy.maximum(numpy.abs(w).reshape(w.shape[0], -1).max(axis=1),
                       1e-12) / 127.0
    w_q = numpy.clip(numpy.round(w / sw[:, None, None, None]),
                     -127, 127).astype(numpy.int8)
    return w_q, sw


def _s2d_weight(w):
    """Space-to-depth-2 weight scatter for the 7x7/s2 stem (identical math
    to ConvLayer._s2d_stem, numpy): (O,C,7,7) -> (O,C*4,4,4); the conv then
    runs stride-1 with block-space padding (2,1)x(2,1) on S2D'd input."""
    o, c = w.shape[:2]
    wp = numpy.pad(w, ((0, 0), (0, 0), (1, 0), (1, 0)))
    wp = wp.reshape(o, c, 4, 2, 4, 2)
    return numpy.ascontiguousarray(
        wp.transpose(0, 1, 3, 5, 2, 4)).reshape(o, c * 4, 4, 4)


def _pack_conv(conv_layer, conv_params, a, b, s_in, zp, s_out, s2d=False):
    """One quantized conv stage: returns arrays + static geometry.

    y_f32 = A[c] * conv_i32(x_q, w_q) + B[c]   equals
    (BN_affine(conv(x, w) + bias)) / s_out  — with x = (x_q + zp) * s_in,
    so every stage's affine output is already in its target code units
    (the executor only rounds/clamps).
    """
    # ConvLayer.apply flips the kernel (Theano true-conv); bake the flip in
    w = numpy.asarray(conv_params["weight"], numpy.float32)[:, :, ::-1, ::-1]
    if s2d:
        w = _s2d_weight(w)
    w_q, sw = _quant_weight(w)
    bias = (numpy.asarray(conv_params["bias"], numpy.float32)
            if conv_layer.use_bias else 0.0)
    A = a * s_in * sw
    B = A * zp * w_q.reshape(w_q.shape[0], -1).sum(axis=1) + a * bias + b
    A = A / s_out
    B = B / s_out
    if s2d:
        geo = {"stride": (1, 1), "pad": ((2, 1), (2, 1)), "zp": float(zp),
               "s2d": True}
    else:
        geo = {"stride": tuple(conv_layer.stride),
               "pad": conv_padding(conv_layer.filter_shape,
                                   conv_layer.border_mode),
               # zp != 0 (the uint8 input conv): the spatial padding must
               # hold the zero-point CODE (-zp), not int8 0 — otherwise the
               # folded zp*sum(w_q) bias correction over-counts at image
               # borders.  The executor pads explicitly with -zp and runs
               # the conv unpadded.
               "zp": float(zp)}
    return {"wq": jnp.asarray(w_q),
            "A": jnp.asarray(A.astype(numpy.float32)),
            "B": jnp.asarray(B.astype(numpy.float32))}, geo


def quantize(model, calib_batches, start="auto"):
    """Calibrate + pack.  Returns (plan, qparams).

    ``plan`` is static (kinds/geometry/scales locations); ``qparams`` is the
    pytree of device arrays passed to the jitted executor.
    ``calib_batches``: iterable of uint8 (B,3,H,W) arrays (the serving
    input format).

    ``start``: "auto" (default) keeps the stem conv + max-pool prefix in
    bf16 and quantizes from the first residual block — measured on v5e, the
    small-channel int8 stem conv and the 256^2 int8 max-pool are SLOWER
    than the optimized bf16 S2D stem (3.4-6.9 ms vs 2.2 ms) while the int8
    residual groups win 1.66x (PERF.md round 2).  "stem" quantizes the
    whole region including the uint8 input conv."""
    ops, end, taps = plan_region(model)
    start_index = 1
    if start == "auto":
        # strip the stem conv/pool prefix (and any taps in it — the bf16
        # prefix loop still computes those skip-src outputs); if the model
        # has no residual blocks at all, fall back to quantizing the full
        # region from the stem rather than failing
        stripped = list(ops)
        while stripped and stripped[0]["kind"] in ("conv", "pool", "tap"):
            stripped = stripped[1:]
        if stripped and stripped[0]["kind"] == "block":
            dropped = ops[:len(ops) - len(stripped)]
            taps = [t for t in taps
                    if t not in [o["out"] for o in dropped
                                 if o["kind"] == "tap"]]
            ops = stripped
            start_index = ops[0]["out"]   # first block's layer index
    in_index = None if start_index == 1 else start_index - 1
    calib_fn = build_calib_fn(model, ops, end, in_index=in_index)
    model.ensure_on_device()
    amax = None
    for xb in calib_batches:
        r = jax.device_get(calib_fn(model.params, model.state,
                                    jnp.asarray(xb)))
        amax = r if amax is None else {k: max(amax[k], v)
                                       for k, v in r.items()}
    assert amax, "need at least one calibration batch"

    params = [jax.device_get(p) if p else p for p in model.params]
    state = [jax.device_get(s) if s else s for s in model.state]

    plan = {"ops": [], "end": end, "taps": list(taps),
            "start": start_index}
    qparams = []
    if in_index is None:
        plan["in_scale"] = None           # uint8 input (zp-128 codes)
        s_cur = 1.0 / 255.0
        zp_cur = 128.0
    else:
        # region input is a post-ReLU bf16 activation: quantize once at the
        # boundary with its calibrated scale
        s_cur = float(amax["region_in"]) / 127.0
        zp_cur = 0.0
        plan["in_scale"] = s_cur
    for k, op in enumerate(ops):
        if op["kind"] == "conv":
            i = op["conv"]
            l = model.layers[i]
            a, b = _bn_affine(model.layers[op["bn"]], params[op["bn"]],
                              state[op["bn"]])
            s_out = float(amax["op%d" % k]) / 127.0

            s2d = bool(getattr(l, "_s2d_eligible", None) and
                       l._s2d_eligible(l.input_shape))
            arrs, geo = _pack_conv(l, params[i], a, b,
                                   s_cur, zp_cur, s_out, s2d=s2d)
            plan["ops"].append({"kind": "conv", "geo": geo,
                                "out": op["out"]})
            qparams.append(arrs)
            s_cur, zp_cur = s_out, 0.0
        elif op["kind"] == "pool":
            l = model.layers[op["index"]]
            plan["ops"].append({"kind": "pool", "out": op["out"],
                                "dims": (1, 1, l.size[0], l.size[1]),
                                "strides": (1, 1, l.stride[0], l.stride[1]),
                                "pad": ((0, 0), (0, 0), l._pad_h, l._pad_w)})
        elif op["kind"] == "tap":
            plan["ops"].append({"kind": "tap", "out": op["out"],
                                "scale": s_cur})
        elif op["kind"] == "block":
            l = model.layers[op["index"]]
            subs = l.sublayers
            sub_p = params[op["index"]]["layers"]
            sub_s = state[op["index"]]["layers"]
            main_convs, proj_conv, proj_bn = _block_structure(l)
            s_in = s_cur
            s_out = float(amax["op%d" % k]) / 127.0
            stages = []
            s_stage = s_in
            for j, ci in enumerate(main_convs):
                a, b = _bn_affine(subs[ci + 1], sub_p[ci + 1], sub_s[ci + 1])
                last = j == len(main_convs) - 1
                s_next = (s_out if last
                          else float(amax["op%d_s%d" % (k, j)]) / 127.0)
                arrs, geo = _pack_conv(subs[ci], sub_p[ci], a, b,
                                       s_stage, 0.0, s_next)
                stages.append({"geo": geo, "requant": not last})
                qparams.append(arrs)
                if not last:
                    s_stage = s_next
            proj = None
            if proj_conv is not None:
                if proj_bn is not None:
                    a, b = _bn_affine(subs[proj_bn], sub_p[proj_bn],
                                      sub_s[proj_bn])
                else:
                    a, b = numpy.float32(1.0), numpy.float32(0.0)
                arrs, geo = _pack_conv(subs[proj_conv], sub_p[proj_conv],
                                       a, b, s_in, 0.0, s_out)
                proj = {"geo": geo}
                qparams.append(arrs)
            plan["ops"].append({"kind": "block", "out": op["out"],
                                "stages": stages, "proj": proj,
                                "id_scale": s_in / s_out})
            s_cur, zp_cur = s_out, 0.0
        else:  # pragma: no cover
            raise AssertionError(op["kind"])
    plan["out_scale"] = s_cur
    return plan, qparams


# -- execution ---------------------------------------------------------------

def _conv_i8(x_q, wq, stride, pad, zp=0.0):
    if zp:
        # pad with the zero-point code so the folded zp*sum(w_q) bias
        # correction is exact at borders (real 0 == code -zp)
        (ph0, ph1), (pw0, pw1) = pad
        x_q = jax.lax.pad(x_q, jnp.array(-int(zp), jnp.int8),
                          ((0, 0, 0), (0, 0, 0), (ph0, ph1, 0),
                           (pw0, pw1, 0)))
        pad = ((0, 0), (0, 0))
    return jax.lax.conv_general_dilated(
        x_q, wq, stride, pad, dimension_numbers=_DN,
        preferred_element_type=jnp.int32)


def _affine(acc_i32, A, B):
    return (acc_i32.astype(jnp.float32) * A[None, :, None, None]
            + B[None, :, None, None])


def _requant(y_f32):
    """relu + round + clamp to the unsigned int8 half-range."""
    return jnp.clip(jnp.round(y_f32), 0.0, 127.0).astype(jnp.int8)


def apply_trunk(plan, qparams, x_in, compute_dtype):
    """Run the quantized region.  ``x_in`` is the uint8 image when the plan
    starts at the stem, else the bf16 region-input activation (quantized
    once at the boundary).  Returns {layer_index: dequantized bf16 tensor}
    for the region end and every skip-src tap (the seed dict for the
    normal-path tail)."""
    dt = compute_dtype or jnp.float32
    if plan.get("in_scale") is None:
        x_q = (x_in.astype(jnp.int16) - 128).astype(jnp.int8)
    else:
        x_q = jnp.clip(jnp.round(x_in.astype(jnp.float32)
                                 / plan["in_scale"]),
                       0.0, 127.0).astype(jnp.int8)
    outs = {}
    pi = 0
    for op in plan["ops"]:
        if op["kind"] == "conv":
            qp = qparams[pi]
            pi += 1
            g = op["geo"]
            if g.get("s2d"):
                # S2D-2 transpose on 1-byte codes (same trick as the bf16
                # stem — ConvLayer._s2d_stem), then a 4x4/s1 conv in block
                # space; zp padding via _conv_i8
                b_, c_, h_, w_ = x_q.shape
                x_q = x_q.reshape(b_, c_, h_ // 2, 2, w_ // 2, 2)
                x_q = x_q.transpose(0, 1, 3, 5, 2, 4).reshape(
                    b_, c_ * 4, h_ // 2, w_ // 2)
            x_q = _requant(_affine(_conv_i8(x_q, qp["wq"], g["stride"],
                                            g["pad"], g["zp"]),
                                   qp["A"], qp["B"]))
        elif op["kind"] == "pool":
            x_q = jax.lax.reduce_window(
                x_q, numpy.int8(-128), jax.lax.max, op["dims"],
                op["strides"], op["pad"])
        elif op["kind"] == "tap":
            outs[op["out"]] = (x_q.astype(jnp.float32)
                               * op["scale"]).astype(dt)
        elif op["kind"] == "block":
            # the residual add runs on int8 CODES at the block-output scale
            # (both operands pre-divided by s_out when packed): every
            # materialized tensor between fusions stays 1 byte — an f32 add
            # would double the epilogue HBM traffic vs the bf16 path
            x_in = x_q
            y_q = None
            for st in op["stages"]:
                qp = qparams[pi]
                pi += 1
                g = st["geo"]
                acc = _affine(_conv_i8(x_q, qp["wq"], g["stride"],
                                       g["pad"]), qp["A"], qp["B"])
                if st["requant"]:
                    x_q = _requant(acc)
                else:       # signed codes (pre-ReLU values can be negative)
                    y_q = jnp.clip(jnp.round(acc), -127.0,
                                   127.0).astype(jnp.int8)
            if op["proj"] is not None:
                qp = qparams[pi]
                pi += 1
                g = op["proj"]["geo"]
                acc = _affine(_conv_i8(x_in, qp["wq"], g["stride"],
                                       g["pad"]), qp["A"], qp["B"])
                sc_q = jnp.clip(jnp.round(acc), -127.0,
                                127.0).astype(jnp.int8)
            else:
                sc_q = jnp.clip(jnp.round(x_in.astype(jnp.float32)
                                          * op["id_scale"]),
                                0.0, 127.0).astype(jnp.int8)
            x_q = jnp.clip(y_q.astype(jnp.int16) + sc_q.astype(jnp.int16),
                           0, 127).astype(jnp.int8)
    outs[plan["end"]] = (x_q.astype(jnp.float32)
                         * plan["out_scale"]).astype(dt)
    return outs


# -- fused quantized detection pipeline --------------------------------------

def build_quant_detect_fn(model, detect_layer, plan, pr_threshold,
                          nms_threshold, corner_k=256, top_m=128, top_n=100,
                          use_soft_nms=False):
    """int8-trunk variant of Model.build_full_detect_fn: quantized prefix,
    then the normal bf16 tail (decoder/heads/corner search/NMS) seeded with
    the dequantized taps.  Signature: fn(qparams, params, state, x_u8)."""
    from denet_tpu.ops import nms_device
    from denet_tpu.ops.corner_search_device import corner_search

    sparse = detect_layer.sparse_layer
    corner_index = sparse.corner_layer.layer_index
    sn = sparse.sample_num

    def run(qparams, params, state, x):
        ctx = Ctx(train=False, compute_dtype=model.compute_dtype)
        start = plan.get("start", 1)
        if start == 1:
            outputs = apply_trunk(plan, qparams, x, model.compute_dtype)
        else:
            # bf16 prefix (stem + pool), then the quantized block region
            outputs = {0: model.prep_input(x, ctx)}
            for i in range(1, start):
                y, _ = model.layers[i].apply(params[i], state[i], outputs,
                                             ctx)
                outputs[i] = y
            outputs.update(apply_trunk(plan, qparams, outputs[start - 1],
                                       model.compute_dtype))
        for i in range(plan["end"] + 1, corner_index + 1):
            y, _ = model.layers[i].apply(params[i], state[i], outputs, ctx)
            outputs[i] = y
        collect = ctx.collect[corner_index]
        diff = collect["corner_diff"]

        bbox, pr, count = corner_search(diff, sparse.corner_threshold, sn,
                                        corner_k)
        bbox4 = bbox.reshape(-1, sn, sn, 4)

        ctx2 = Ctx(train=False, compute_dtype=model.compute_dtype,
                   aux={"sample_feat": collect["sample"],
                        "sample_bbox": bbox4})
        model.forward_range(params, state, corner_index + 1,
                            {corner_index: None}, ctx2)
        outs = detect_layer.detect_outputs(
            ctx2.collect[detect_layer.layer_index])
        final_bbox = outs.get("bbox", bbox4)
        dets, det_count = nms_device.nms(
            outs["det_pr"], outs["fitness"], final_bbox, count,
            pr_threshold=pr_threshold, nms_threshold=nms_threshold,
            top_m=top_m, top_n=top_n, use_soft_nms=use_soft_nms)
        return dets, det_count

    return _keepalive(jax.jit(run))
