"""Pallas TPU kernel for the directed-sparse-sampling RoI gather.

The reference implements this op as a CUDA kernel with one thread per sample
(denet/layer/denet_sparse_op.py).  A thread-per-sample scalar gather is the
wrong shape for a TPU — instead the gather becomes a **one-hot matmul on the
MXU**: for each of the gs x gs grid offsets, the sn^2 nearest-neighbour flat
indices expand to a (sn^2, H*W) one-hot matrix multiplied against the
(H*W, F) feature table.  At DeNet sizes (sn=24, gs=7, 64x64 maps, F=96)
that is ~22 GFLOP/image of dense bf16 MXU work — microseconds — with fully
static shapes and no scatter/gather units involved.

Grid: one program per image; the image's feature map and sample bboxes live
in VMEM.  Semantics identical to ops.sparse_gather (same rounding, clipping,
channel layout, h/w channels); the custom VJP reuses the XLA scatter-add
transpose so training works through either implementation.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from denet_tpu.ops.sparse_gather import sparse_gather as sparse_gather_xla


def _kernel(feat_ref, bbox_ref, out_ref, *, grid_size, h, w, f, sn):
    gs = grid_size
    feat = feat_ref[0]                       # (F, H, W)
    feat_flat = feat.reshape(f, h * w)
    bbox = bbox_ref[0]                       # (sn, sn, 4)

    x0 = bbox[:, :, 0]
    y0 = bbox[:, :, 1]
    bw = bbox[:, :, 2] - x0
    bh = bbox[:, :, 3] - y0

    hw_ids = jax.lax.broadcasted_iota(jnp.int32, (sn * sn, h * w), 1)

    for gy in range(gs):
        for gx in range(gs):
            ty = gy / (gs - 1) if gs > 1 else 0.0
            tx = gx / (gs - 1) if gs > 1 else 0.0
            sx = jnp.clip((x0 + tx * bw) * w, 0, w - 1)
            sy = jnp.clip((y0 + ty * bh) * h, 0, h - 1)
            xi = jnp.floor(sx + 0.5).astype(jnp.int32)
            yi = jnp.floor(sy + 0.5).astype(jnp.int32)
            flat = (yi * w + xi).reshape(sn * sn, 1)

            onehot = (hw_ids == flat).astype(feat.dtype)        # (sn^2, HW)
            gathered = jax.lax.dot_general(
                onehot, feat_flat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (sn^2, F)
            g = gy * gs + gx
            block = gathered.reshape(sn, sn, f).transpose(2, 0, 1)
            out_ref[0, g * f:(g + 1) * f] = block.astype(out_ref.dtype)

    out_ref[0, f * gs * gs] = bh.astype(out_ref.dtype)
    out_ref[0, f * gs * gs + 1] = bw.astype(out_ref.dtype)


def _forward(sample_feat, sample_bbox, grid_size, interpret=False):
    b, f, h, w = sample_feat.shape
    _, sn, _, _2 = sample_bbox.shape
    out_feat = f * grid_size * grid_size + 2

    kernel = functools.partial(_kernel, grid_size=grid_size, h=h, w=w, f=f,
                               sn=sn)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, f, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sn, sn, 4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_feat, sn, sn), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_feat, sn, sn),
                                       sample_feat.dtype),
        interpret=interpret,
    )(sample_feat, sample_bbox)


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
