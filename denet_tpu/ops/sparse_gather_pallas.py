"""Pallas TPU kernel for the directed-sparse-sampling RoI gather.

The reference implements this op as a CUDA kernel with one thread per sample
(denet/layer/denet_sparse_op.py).  A thread-per-sample scalar gather is the
wrong shape for a TPU — instead the gather becomes a **one-hot matmul on the
MXU**: for each of the gs x gs grid offsets, the sn^2 nearest-neighbour flat
indices expand to a one-hot (sn^2, H*W) matrix and the gather is
feat_flat (F, H*W) contracted with it -> (F, sn^2).  At DeNet sizes (sn=24,
gs=7, 64x64 maps, F=96) that is ~22 GFLOP/image of dense MXU work —
microseconds — with fully static shapes and no scatter/gather units.

Mosaic-friendly layout choices: the sample axis stays flat (sn^2) inside the
kernel; bbox components live in column vectors sliced from a (sn^2, 4)
block; no transposes, no minor-dim reshapes, no dynamic gathers.  The
(sn, sn) unflatten and the two h/w channels are appended outside in XLA.
Semantics identical to ops.sparse_gather (same rounding, clipping, channel
layout); the custom VJP reuses the XLA scatter-add transpose so training
works through either implementation.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denet_tpu.ops.sparse_gather import sparse_gather as sparse_gather_xla


HW_CHUNK = 512   # one-hot slab width: bounds VMEM intermediates


def _chunk_for(sn2, h, w):
    """Slab width scaled so the (sn2, chunk) one-hot + iota stay within
    VMEM: ~512 at skip sizes (sn2=576), 128 at wide sizes (sn2=2304)."""
    budget = 512 * 576            # elements per slab that fit comfortably
    c = HW_CHUNK
    while c > 128 and sn2 * c > budget:
        c //= 2
    c = min(c, h * w)
    # the slab loop is rolled: h*w must divide evenly (true for the 2^k
    # spatial maps convolutional trunks produce; otherwise one full slab)
    return c if (h * w) % c == 0 else h * w


def _kernel(feat_ref, bbox_ref, out_ref, *, grid_size, h, w, f, sn2, chunk):
    """One program per (image, grid offset): builds the (sn2, HW_CHUNK)
    one-hot slabs and accumulates feat_chunk @ onehot^T on the MXU."""
    gs = grid_size
    g = pl.program_id(1)
    gy = g // gs
    gx = g % gs
    inv = 1.0 / (gs - 1) if gs > 1 else 0.0

    feat_flat = feat_ref[0]                        # (f, h*w), pre-flattened
    bbox = bbox_ref[0]                             # (sn2, 4)

    x0 = bbox[:, 0:1]                              # (sn2, 1) columns
    y0 = bbox[:, 1:2]
    bw = bbox[:, 2:3] - x0
    bh = bbox[:, 3:4] - y0

    tx = gx.astype(jnp.float32) * inv
    ty = gy.astype(jnp.float32) * inv
    sx = jnp.clip((x0 + tx * bw) * w, 0, w - 1)
    sy = jnp.clip((y0 + ty * bh) * h, 0, h - 1)
    xi = jnp.floor(sx + 0.5).astype(jnp.int32)
    yi = jnp.floor(sy + 0.5).astype(jnp.int32)
    flat = yi * w + xi                              # (sn2, 1)

    hw_ids = jax.lax.broadcasted_iota(jnp.int32, (sn2, chunk), 1)
    acc = jnp.zeros((f, sn2), dtype=jnp.float32)
    # unrolled slab loop: 8 steps at skip-class sizes, which Mosaic
    # pipelines well.  (A rolled fori_loop variant compiles at any size but
    # serializes the tiny matmuls — measured 15x SLOWER than the XLA gather
    # at wide sizes — and unrolling large slab counts spills hundreds of MB
    # of registers, so big-sn2 shapes route to the XLA gather instead.)
    for c in range(0, h * w, chunk):
        onehot = (hw_ids + c == flat).astype(feat_flat.dtype)   # (sn2, chunk)
        # HIGHEST precision: an f32 gather must not round features through
        # the MXU's bf16 input path (one-hot weights are exact either way)
        acc = acc + jax.lax.dot_general(
            feat_flat[:, c:c + chunk], onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)                 # (F, sn2)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _forward(sample_feat, sample_bbox, grid_size, interpret=False):
    b, f, h, w = sample_feat.shape
    _, sn, _, _2 = sample_bbox.shape
    sn2 = sn * sn
    gs2 = grid_size * grid_size

    bbox_flat = sample_bbox.reshape(b, sn2, 4)
    # flatten the spatial axes in XLA — an in-kernel merge of non-lane-aligned
    # minor dims is a Mosaic relayout hazard
    feat_flat_in = sample_feat.reshape(b, f, h * w)

    kernel = functools.partial(_kernel, grid_size=grid_size, h=h, w=w, f=f,
                               sn2=sn2, chunk=_chunk_for(sn2, h, w))
    out = pl.pallas_call(
        kernel,
        grid=(b, gs2),
        in_specs=[
            pl.BlockSpec((1, f, h * w), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sn2, 4), lambda i, g: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, f, sn2), lambda i, g: (i, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, gs2, f, sn2), sample_feat.dtype),
        interpret=interpret,
    )(feat_flat_in, bbox_flat)

    # (B, gs2, F, sn2) -> (B, gs2*F, sn, sn): channel layout c = g*F + f
    out = out.reshape(b, f * gs2, sn, sn)
    # h/w channels appended in XLA (reference layout: ..., h, w)
    bh = (sample_bbox[..., 3] - sample_bbox[..., 1]).astype(out.dtype)
    bw = (sample_bbox[..., 2] - sample_bbox[..., 0]).astype(out.dtype)
    return jnp.concatenate([out, bh[:, None], bw[:, None]], axis=1)


def supported_shape(sample_bbox):
    """Kernel sweet spot: skip-class sample counts.  Above sn^2=1024 the
    unrolled slab loop spills registers and the rolled variant serializes —
    the XLA gather wins there (measured 10.8 vs 157 ms at sn=48)."""
    _, sn, _, _2 = sample_bbox.shape
    return sn * sn <= 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sparse_gather_pallas(sample_feat, sample_bbox, grid_size, interpret=False):
    return _forward(sample_feat, sample_bbox, grid_size, interpret)


def _fwd(sample_feat, sample_bbox, grid_size, interpret):
    out = _forward(sample_feat, sample_bbox, grid_size, interpret)
    return out, (sample_feat, sample_bbox)


def _bwd(grid_size, interpret, residuals, g):
    # reuse the XLA implementation's autodiff transpose (scatter-add for the
    # feature gradient, h/w-channel gradients for the bbox)
    sample_feat, sample_bbox = residuals
    _, vjp = jax.vjp(lambda sf, bb: sparse_gather_xla(sf, bb, grid_size),
                     sample_feat, sample_bbox)
    return vjp(g)


sparse_gather_pallas.defvjp(_fwd, _bwd)
