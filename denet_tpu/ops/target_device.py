"""Device-side training-target construction.

TPU-native replacement for the host target pipeline: the reference builds
dense corner heatmaps and IoU-matched detection targets in numpy/C++ on the
host every step (denet/layer/denet_corner.py:96-121,
denet/layer/denet_detect.py:147-313, denet/layer/denet_sparse.py:164-206)
and uploads them to the accelerator.  Here the training step receives only
compact per-image ground-truth arrays

    gt_bbox (B, K, 4) float32   padded with zeros
    gt_class (B, K)   int32
    gt_count (B,)     int32

and everything else — random sample selection, dense heatmap scatter, IoU
matching, fitness binning — is traced into the SAME jit as the forward/
backward pass.  This removes all per-step host work and the multi-MB dense
target uploads, and lets sample selection use *current* (not one-step-stale)
parameters.

Semantics are kept exactly parity with the host builders (same rounding,
thresholds, normalizations, slot layout); random choices use jax PRNG
streams instead of the host `random`/`numpy.random` modules, so individual
draws differ but the distributions match the reference.
"""
import math

import jax
import jax.numpy as jnp


def iou_matrix_device(a, b):
    """Batched IoU: a (B, K, 4) x b (B, S, 4) -> (B, K, S) float32.

    Same math as utils.iou_matrix (reference theano_util get_overlap_iou).
    """
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    dx = jnp.maximum(jnp.minimum(a[:, :, None, 2], b[:, None, :, 2]) -
                     jnp.maximum(a[:, :, None, 0], b[:, None, :, 0]), 0.0)
    dy = jnp.maximum(jnp.minimum(a[:, :, None, 3], b[:, None, :, 3]) -
                     jnp.maximum(a[:, :, None, 1], b[:, None, :, 1]), 0.0)
    inter = dx * dy
    union = area_a[:, :, None] + area_b[:, None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def select_samples(cand_bbox, cand_count, gt_bbox, gt_count, rng, sample_num,
                   random_sample, sample_gt):
    """Training sample selection on device (denet_sparse.py:164-206).

    cand_bbox (B, S, 4) score-sorted candidates from the device corner
    search, cand_count (B,) how many are real.  Reproduces the host
    semantics: keep a uniform random subset of at most
    ``S - floor(random_sample * S)`` candidates, fill the remaining slots
    with random boxes (x0,y0 ~ U(0,1), x1 ~ U(x0,1), y1 ~ U(y0,1)), then
    overwrite the LAST gt_count slots with the ground-truth boxes
    (``sample_gt``).  Returns (B, sample_num, sample_num, 4).
    """
    b, s, _ = cand_bbox.shape
    n_keep = s - int(math.floor(random_sample * s))

    r_pri, r_x0, r_y0, r_x1, r_y1 = jax.random.split(rng, 5)

    # uniform random subset of the real candidates == ascending random
    # priorities, +inf for padding slots (random.sample equivalence)
    is_real = jnp.arange(s, dtype=jnp.int32)[None, :] < cand_count[:, None]
    pri = jnp.where(is_real, jax.random.uniform(r_pri, (b, s)), jnp.inf)
    order = jnp.argsort(pri, axis=1)
    sel = jnp.take_along_axis(cand_bbox, order[..., None], axis=1)

    keep_n = jnp.minimum(cand_count, n_keep)
    use_cand = jnp.arange(s, dtype=jnp.int32)[None, :] < keep_n[:, None]

    x0 = jax.random.uniform(r_x0, (b, s))
    y0 = jax.random.uniform(r_y0, (b, s))
    x1 = x0 + jax.random.uniform(r_x1, (b, s)) * (1.0 - x0)
    y1 = y0 + jax.random.uniform(r_y1, (b, s)) * (1.0 - y0)
    rand_bbox = jnp.stack([x0, y0, x1, y1], axis=-1)

    out = jnp.where(use_cand[..., None], sel, rand_bbox)

    if sample_gt:
        # slot s hosts gt index (S-1-s) when that index is a real gt
        gt_idx = (s - 1) - jnp.arange(s, dtype=jnp.int32)
        use_gt = gt_idx[None, :] < gt_count[:, None]
        k = gt_bbox.shape[1]
        idx = jnp.broadcast_to(jnp.clip(gt_idx, 0, k - 1)[None, :, None],
                               (b, s, 1))
        gt_at = jnp.take_along_axis(gt_bbox, idx, axis=1)
        out = jnp.where(use_gt[..., None], gt_at, out)

    return out.reshape(b, sample_num, sample_num, 4).astype(jnp.float32)


def corner_target(gt_bbox, gt_count, height, width, use_center,
                  dropout=0.0, rng=None):
    """Dense corner target heatmaps on device (denet_corner.py:96-121).

    Returns (B, 2, corner_num, H, W) float32: channel [.,1] holds scattered
    ground-truth corner indicators, [.,0] = 1 - that, normalized by
    W*H*corner_num; optional target dropout.
    """
    b, k, _ = gt_bbox.shape
    cn = 5 if use_center else 4
    h, w = height, width

    x0 = jnp.round(gt_bbox[..., 0] * w).astype(jnp.int32)
    y0 = jnp.round(gt_bbox[..., 1] * h).astype(jnp.int32)
    x1 = jnp.maximum(x0, jnp.round(gt_bbox[..., 2] * w).astype(jnp.int32) - 1)
    y1 = jnp.maximum(y0, jnp.round(gt_bbox[..., 3] * h).astype(jnp.int32) - 1)

    kvalid = jnp.arange(k, dtype=jnp.int32)[None, :] < gt_count[:, None]
    hot = jnp.zeros((b, cn, h, w), dtype=jnp.float32)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]

    corners = [(0, y0, x0), (1, y0, x1), (2, y1, x0), (3, y1, x1)]
    if use_center:
        cx = jnp.round((gt_bbox[..., 0] + gt_bbox[..., 2]) * 0.5 * w
                       ).astype(jnp.int32)
        cy = jnp.round((gt_bbox[..., 1] + gt_bbox[..., 3]) * 0.5 * h
                       ).astype(jnp.int32)
        corners.append((4, cy, cx))

    for t, yy, xx in corners:
        # host bound checks (0 <= x < w etc.); negative indices would WRAP
        # in .at[], so clamp the coords and scatter 0.0 for invalid entries
        # (a no-op under max since hot >= 0)
        ok = (kvalid & (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h))
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        hot = hot.at[bidx, t, yy, xx].max(ok.astype(jnp.float32))

    target = jnp.stack([1.0 - hot, hot], axis=1) / float(w * h * cn)

    if dropout > 0.0:
        assert rng is not None
        mask = jax.random.bernoulli(rng, 1.0 - dropout, (b, cn, h, w))
        target = target * mask[:, None].astype(jnp.float32) / (1.0 - dropout)
    return target


def detect_targets(gt_bbox, gt_class, gt_count, sample_bbox, class_num,
                   overlap_threshold, use_jointfit, use_indfit, use_bbox_reg,
                   fitness_num, null_class, s0):
    """Detection-head targets on device (denet_detect.py:147-247 semantics).

    sample_bbox: (B, sn, sn, 4).  Returns dict with
      det_pr     (B, s0, sn, sn)          normalized, /nfactor
      bbox_valid (B, sn, sn)              if use_bbox_reg, /nfactor
      bbox_reg   (B, 8, sn, sn)           if use_bbox_reg
      indfit_pr  (B, fitness_num, sn, sn) if use_indfit, /nfactor
    """
    b, sn, _, _ = sample_bbox.shape
    s = sn * sn
    samples = sample_bbox.reshape(b, s, 4)
    k = gt_bbox.shape[1]
    t0, t1 = overlap_threshold

    kvalid = jnp.arange(k, dtype=jnp.int32)[None, :] < gt_count[:, None]
    ov = iou_matrix_device(gt_bbox, samples)            # (B, K, S)
    ov = jnp.where(kvalid[..., None], ov, 0.0)

    hit = (ov > t0).astype(jnp.float32)                  # (B, K, S)
    f_rel = (ov - t0) / (1.0 - t0)

    cls_oh = jax.nn.one_hot(gt_class, class_num, dtype=jnp.float32)  # (B,K,C)
    any_hit = jnp.max(hit, axis=1)                       # (B, S)

    if use_jointfit:
        fbin = jnp.clip(jnp.floor(fitness_num * f_rel).astype(jnp.int32),
                        0, fitness_num - 1)
        fit_oh = jax.nn.one_hot(fbin, fitness_num,
                                dtype=jnp.float32) * hit[..., None]
        # counts[b, c, f, s] = sum_k hit * cls_oh * fit_oh  (MXU einsum)
        counts = jnp.einsum("bksf,bkc->bcfs", fit_oh, cls_oh)
        det = (counts > 0.0).astype(jnp.float32).reshape(
            b, class_num * fitness_num, s)
    else:
        counts = jnp.einsum("bks,bkc->bcs", hit, cls_oh)
        det = (counts > 0.0).astype(jnp.float32)

    null = (1.0 - any_hit)[:, None]
    det_pr = jnp.concatenate([det[:, :null_class], null,
                              det[:, null_class:]], axis=1)
    det_pr = det_pr / jnp.sum(det_pr, axis=1, keepdims=True)

    nfactor = float(s)
    out = {"det_pr": (det_pr / nfactor).reshape(b, s0, sn, sn)}

    if use_bbox_reg:
        best = jnp.argmax(ov, axis=1)                    # (B, S) first max
        ov_best = jnp.max(ov, axis=1)
        valid = ov_best > t1
        tgt = jnp.take_along_axis(gt_bbox, best[..., None], axis=1)  # (B,S,4)

        def cwh(bb):
            return (0.5 * (bb[..., 0] + bb[..., 2]),
                    0.5 * (bb[..., 1] + bb[..., 3]),
                    bb[..., 2] - bb[..., 0], bb[..., 3] - bb[..., 1])

        tcx, tcy, tw, th = cwh(tgt)
        scx, scy, sw, sh = cwh(samples)
        ones = jnp.ones_like(tcx)
        zeros = jnp.zeros_like(tcx)
        reg = jnp.stack([tcx, tcy, tw, th, scx, scy, sw, sh], axis=1)
        default = jnp.stack([zeros, zeros, ones, ones,
                             zeros, zeros, ones, ones], axis=1)
        reg = jnp.where(valid[:, None, :], reg, default)
        out["bbox_valid"] = (valid.astype(jnp.float32) / nfactor
                             ).reshape(b, sn, sn)
        out["bbox_reg"] = reg.reshape(b, 8, sn, sn)

    if use_indfit:
        fbin = jnp.clip(1 + jnp.floor((fitness_num - 1) * f_rel
                                      ).astype(jnp.int32), 1, fitness_num - 1)
        fit_oh = jax.nn.one_hot(fbin, fitness_num,
                                dtype=jnp.float32) * hit[..., None]
        counts = jnp.einsum("bksf->bfs", fit_oh)
        ind = (counts > 0.0).astype(jnp.float32)
        ind = ind.at[:, 0].set(1.0 - any_hit)
        ind = ind / jnp.sum(ind, axis=1, keepdims=True)
        out["indfit_pr"] = (ind / nfactor).reshape(b, fitness_num, sn, sn)

    return out


def pack_gt_arrays(metas, gt_cap=128):
    """Host: pack meta dicts into the compact padded gt arrays (numpy)."""
    import numpy
    b = len(metas)
    gt_bbox = numpy.zeros((b, gt_cap, 4), dtype=numpy.float32)
    gt_class = numpy.zeros((b, gt_cap), dtype=numpy.int32)
    gt_count = numpy.zeros((b,), dtype=numpy.int32)
    for i, meta in enumerate(metas):
        bboxes = meta.get("bbox", [])
        n = min(len(bboxes), gt_cap)
        if n:
            gt_bbox[i, :n] = numpy.asarray(bboxes[:n], dtype=numpy.float32)
            gt_class[i, :n] = numpy.asarray(meta["class"][:n],
                                            dtype=numpy.int32)
        gt_count[i] = n
    return gt_bbox, gt_class, gt_count
