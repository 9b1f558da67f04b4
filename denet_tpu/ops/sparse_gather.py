"""Directed-sparse-sampling gather: the DeNet RoI sampling op.

Given per-image sample features ``(B, F, H, W)`` and sample bboxes
``(B, sn, sn, 4)`` (normalized x0,y0,x1,y1), produce ``(B, F*gs*gs+2, sn, sn)``
where each sample contributes a gs x gs grid of *nearest-neighbour* feature
samples over its bbox plus bbox height/width channels.  Channel layout is
grid-major / feature-minor: c = (gy*gs + gx)*F + f, then h, w — matching the
reference fallback graph (denet/layer/denet_sparse.py:70-96) which is the
reference's own parity target for its CUDA op (denet_sparse_op.py).

Rounding is half-away-from-zero (CUDA lroundf / theano round semantics), not
numpy's half-to-even; coordinates are non-negative so floor(x + 0.5) is exact.

Implementation: a single XLA gather (take along the flattened B*H*W axis).
The VJP is the transposed scatter-add which XLA emits natively — on TPU this
runs as a sorted segment-sum, no atomics needed.  A Pallas double-buffered
variant can replace this if the gather shows up in profiles; at DeNet sizes
(sn^2 <= 1296 samples, gs <= 7) the gather is a tiny fraction of step time.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_size", "impl"))
def sparse_gather(sample_feat, sample_bbox, grid_size, impl="flat"):
    """impl selects the gather lowering (bitwise-identical results):

    - "flat": transpose the feature map to an (B*H*W, F) table and do one
      flat ``take`` (shipped default).  Pays a full NCHW->NHWC layout copy
      of the feature map before the gather.
    - "nchw": keep NCHW and ``take_along_axis`` over the flattened spatial
      axis, then transpose only the gathered (B, F, sn, sn, gs, gs) result
      into grid-major channel order — the layout copy shrinks from the
      whole feature map to the gathered samples.  Round-5 A/B arm for the
      HLO-audit gather lever (scripts/ab_gather.py).
    """
    b, f, h, w = sample_feat.shape
    _, sn, sn2, _ = sample_bbox.shape
    gs = grid_size

    x0 = sample_bbox[..., 0]
    y0 = sample_bbox[..., 1]
    bw = sample_bbox[..., 2] - x0
    bh = sample_bbox[..., 3] - y0

    t = jnp.arange(gs, dtype=jnp.float32) / (gs - 1) if gs > 1 else \
        jnp.zeros((1,), dtype=jnp.float32)
    # (b, sn, sn, gs)
    sx = x0[..., None] + t[None, None, None, :] * bw[..., None]
    sy = y0[..., None] + t[None, None, None, :] * bh[..., None]

    sxf = jnp.clip(sx * w, 0, w - 1)
    syf = jnp.clip(sy * h, 0, h - 1)
    sxi = jnp.floor(sxf + 0.5).astype(jnp.int32)
    syi = jnp.floor(syf + 0.5).astype(jnp.int32)

    if impl == "nchw":
        # (b, sj, si, gy, gx) flat spatial index, batch kept as an axis
        sp_ix = syi[..., :, None] * w + sxi[..., None, :]
        featf = sample_feat.reshape(b, f, h * w)
        gathered = jnp.take_along_axis(
            featf, sp_ix.reshape(b, 1, sn * sn2 * gs * gs), axis=2)
        gathered = gathered.reshape(b, f, sn, sn2, gs, gs)
        sample = jnp.transpose(gathered, (0, 4, 5, 1, 2, 3)).reshape(
            b, gs * gs * f, sn, sn2)
    else:
        # flat (b*h*w) spatial index per (b, sj, si, gy, gx)
        batch_ix = jnp.arange(b, dtype=jnp.int32)[:, None, None, None, None]
        flat_ix = (batch_ix * (h * w) + syi[..., :, None] * w +
                   sxi[..., None, :])

        # (b*h*w, f) gather table
        table = jnp.transpose(sample_feat, (0, 2, 3, 1)).reshape(b * h * w, f)
        gathered = jnp.take(table, flat_ix.reshape(-1), axis=0)
        # (b, sn, sn, gs*gs*f) with grid-major channel order
        gathered = gathered.reshape(b, sn, sn2, gs * gs * f)
        sample = jnp.transpose(gathered, (0, 3, 1, 2))

    out = jnp.concatenate([sample, bh[:, None, :, :], bw[:, None, :, :]], axis=1)
    return out
