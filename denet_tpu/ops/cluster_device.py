"""Device-side (XLA) greedy corner clustering with quota redistribution.

TPU-native port of the reference ``apply_cluster`` (denet_sparse.cc:165-242;
host port ops/native/denet_ops.cc) — the last host round-trip of the v2
(corner-clustering) inference path.  With this op the whole v2 pipeline
fuses into ONE jit like the v1 path: corner search -> clustering -> RoI
gather -> detect head -> NMS, no candidate download / clustered-bbox upload
per batch.

Algorithm equivalence: the reference's sequential greedy merge (each sample
joins/merges every cluster containing a member it overlaps above the IoU
threshold) partitions samples into exactly the CONNECTED COMPONENTS of the
graph with edges IoU(i,j) > threshold — incremental union of components is
order-independent.  On device the components are found by min-label
propagation with pointer jumping (Shiloach-Vishkin style) over a
precomputed adjacency matrix: the N x N bitmap is built once (~N^2 VPU ops)
and each hook iteration is a masked row-min over it, so iterations are
HBM-bandwidth cheap; pointer jumping keeps the iteration count at
O(log(component diameter)).

Quota redistribution (reference :210-236): cap clusters at ``output_num``
by (size desc), ratio = (output_num - C) / (S - C), every kept cluster
contributes its best min(size, 1 + floor(size*ratio)) members by pr, and
the final survivors are re-sorted by pr and capped at ``output_num``.

Deliberate deviations from the host implementation (both bounded to one
sample at exact boundaries, parity-tested off-boundary):
  * cluster-cap ties on equal sizes break by best-member pr (the host C++
    was aligned to the same rule; the reference used std::list insertion
    order, which is not reproducible in a data-parallel formulation),
  * the quota ``floor(size * ratio)`` uses exact integer arithmetic
    (size * (output_num - C)) // (S - C) instead of double rounding.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy


def _adjacency(bbox, valid, threshold):
    """bbox (N,4), valid (N,) -> bool (N,N): IoU > threshold between valid."""
    area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
    dx = jnp.maximum(0.0, jnp.minimum(bbox[:, None, 2], bbox[None, :, 2]) -
                     jnp.maximum(bbox[:, None, 0], bbox[None, :, 0]))
    dy = jnp.maximum(0.0, jnp.minimum(bbox[:, None, 3], bbox[None, :, 3]) -
                     jnp.maximum(bbox[:, None, 1], bbox[None, :, 1]))
    inter = dx * dy
    union = area[:, None] + area[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-12)
    return (iou > threshold) & valid[:, None] & valid[None, :]


def _connected_components(adj):
    """adj (B,N,N) bool -> labels (B,N) i32: min sample index per component.

    Shiloach-Vishkin style, batched over images: each outer iteration does
    ONE N^2 masked-min hook per image (every node pulls its min neighbor
    label), a scatter-min of the result onto the node's current root (so
    roots aggregate the min over their whole component — this is what makes
    convergence O(log components-per-cluster) instead of O(graph diameter);
    the pull-only formulation ran 20-25 N^2 passes on dense candidate
    fields vs ~5 here), and TWO pointer-jump rounds.  Probe-measured
    (scripts/probe_cluster_jump.py) design rules baked in:
      * every 1-D gather pays a fixed ~0.17 ms floor on TPU regardless of
        size, so the whole batch jumps through ONE flat gather (indices
        offset per image) instead of B vmapped gathers, and only 2 jump
        rounds per iteration (scatter+2flatjump beat 4/13-jump variants:
        4.45 ms vs 9-20 ms at N=2304 dense);
      * the adjacency is threaded through the while_loop CARRY: left as a
        free variable XLA fuses the whole IoU computation into every hook
        iteration (measured 17-70 ms/batch at N=6144); carried, it
        materializes once and each hook is one N^2 masked-min read."""
    b, n, _ = adj.shape
    idx = jnp.arange(n, dtype=jnp.int32)
    off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]

    def body(state):
        labels, _, adj_c = state
        # hook: pull the smallest neighbor label
        neigh = jnp.min(jnp.where(adj_c, labels[:, None, :], n), axis=2)
        v = jnp.minimum(labels, neigh.astype(jnp.int32))
        # aggregate onto the current root: the root's label becomes the
        # min over every member's neighborhood (component-level hop)
        new = labels.reshape(-1).at[(labels + off).reshape(-1)].min(
            v.reshape(-1)).reshape(b, n)
        # pointer jumping: label chains step toward their root value
        for _ in range(2):
            new = new.reshape(-1)[(new + off).reshape(-1)].reshape(b, n)
        return new, jnp.any(new != labels), adj_c

    labels0 = jnp.broadcast_to(idx, (b, n))
    labels, _, _ = jax.lax.while_loop(lambda s: s[1], body,
                                      (labels0, jnp.bool_(True), adj))
    return labels


def _cluster_one(bbox, pr, count, labels, threshold, output_num,
                 input_num, distinct_second=False):
    """One image: bbox (N,4), pr (N,) sorted desc, count (), labels (N,)
    component ids -> (out_bbox (output_num,4), out_pr (output_num,),
    out_count ()).

    ``distinct_second``: experimental occlusion-aware quota variant — each
    cluster's SECOND kept member is the member least overlapping the
    representative (min IoU to rep) instead of the next-best by pr, so an
    occluded object merged into its occluder's cluster keeps a candidate.
    The reference redistributes purely by size/pr
    (denet_sparse.cc:210-236); default False = reference-faithful."""
    n = bbox.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < jnp.minimum(count, input_num)
    s_total = jnp.sum(valid.astype(jnp.int32))

    # cluster sizes + representative (min index == best pr) bookkeeping
    sizes = jnp.zeros(n, dtype=jnp.int32).at[labels].add(
        valid.astype(jnp.int32))
    is_rep = valid & (labels == idx)
    c_total = jnp.sum(is_rep.astype(jnp.int32))

    # cap clusters at output_num by (size desc, representative index asc):
    # sort-based rank (O(N log N)) instead of an N^2 comparison matrix —
    # composite key size*N - idx, non-reps pushed to the end
    # i32 is safe: sizes*n <= N^2 = 37.7M at the 6144 cap, far below 2^31
    key = jnp.where(is_rep, sizes * n - idx, -1)
    order = jnp.argsort(-key)
    cluster_rank = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    kept_rep = is_rep & (cluster_rank < output_num)

    c_kept = jnp.minimum(c_total, output_num)
    # integer quota: n_c = min(size, 1 + size*(output_num-C)//(S-C))
    denom = jnp.maximum(1, s_total - c_kept)
    numer = jnp.maximum(0, output_num - c_kept)
    quota = jnp.minimum(sizes, 1 + (sizes * numer) // denom)

    # member rank within the cluster (candidates are pr-desc ordered, so
    # rank position == "best members first"): stable sort by label makes
    # clusters contiguous in index order; rank = position - segment start
    morder = jnp.argsort(jnp.where(valid, labels, n), stable=True)
    slabels = labels[morder]
    pos = jnp.arange(n, dtype=jnp.int32)
    seg_new = jnp.concatenate([jnp.ones(1, bool),
                               slabels[1:] != slabels[:-1]])
    seg_start = jax.lax.cummax(jnp.where(seg_new, pos, 0))
    member_rank = jnp.zeros(n, dtype=jnp.int32).at[morder].set(
        pos - seg_start)

    if distinct_second:
        # promote the most-spatially-distinct member to rank 1: per cluster,
        # the member (rank >= 1) minimizing IoU to the representative swaps
        # into the second slot; members it displaces shift down one.
        rep_bbox = bbox[labels]
        dx = jnp.maximum(0.0, jnp.minimum(bbox[:, 2], rep_bbox[:, 2]) -
                         jnp.maximum(bbox[:, 0], rep_bbox[:, 0]))
        dy = jnp.maximum(0.0, jnp.minimum(bbox[:, 3], rep_bbox[:, 3]) -
                         jnp.maximum(bbox[:, 1], rep_bbox[:, 1]))
        inter = dx * dy
        area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
        rep_area = (rep_bbox[:, 2] - rep_bbox[:, 0]) * \
            (rep_bbox[:, 3] - rep_bbox[:, 1])
        iou_rep = inter / jnp.maximum(area + rep_area - inter, 1e-12)
        elig = valid & (member_rank >= 1)
        key2 = jnp.where(elig, iou_rep, jnp.inf)
        min_key = jnp.full(n, jnp.inf, key2.dtype).at[labels].min(key2)
        is_min = elig & (key2 <= min_key[labels])
        min_idx = jnp.full(n, n, jnp.int32).at[labels].min(
            jnp.where(is_min, idx, n))
        chosen = is_min & (idx == min_idx[labels])
        chosen_rank = jnp.zeros(n, jnp.int32).at[labels].max(
            jnp.where(chosen, member_rank, 0))
        cr = chosen_rank[labels]
        member_rank = jnp.where(
            chosen, 1,
            jnp.where((member_rank >= 1) & (member_rank < cr),
                      member_rank + 1, member_rank))

    keep = valid & kept_rep[labels] & (member_rank < quota[labels])
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    keep = keep & (pos < output_num)

    sink = jnp.where(keep, pos, output_num)   # dropped rows scatter off-end
    out_bbox = jnp.zeros((output_num + 1, 4), bbox.dtype).at[sink].set(
        bbox)[:output_num]
    out_pr = jnp.zeros((output_num + 1,), pr.dtype).at[sink].set(
        pr)[:output_num]
    out_count = jnp.sum(keep.astype(jnp.int32))
    return out_bbox, out_pr, out_count


@partial(jax.jit, static_argnames=("threshold", "output_num", "input_num",
                                   "distinct_second"))
def cluster_candidates(bbox, pr, count, threshold, output_num,
                       input_num=None, distinct_second=False):
    """bbox (B,N,4) f32, pr (B,N) sorted desc per image, count (B,) i32 ->
    (bbox (B,output_num,4), pr (B,output_num), count (B,)) — the traced
    equivalent of ops.native.cluster_samples (output ordered by pr desc).

    ``input_num`` caps how many top-pr candidates enter clustering (the
    reference uses 10*sample_count; the device path may cap lower to bound
    the N^2 adjacency — e.g. 23040 candidates of the wide config would need
    a 530MB bitmap per image)."""
    if input_num is None:
        input_num = bbox.shape[1]
    input_num = min(input_num, bbox.shape[1])
    n = bbox.shape[1]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx[None, :] < jnp.minimum(count, input_num)[:, None]
    adj = jax.vmap(lambda b, v: _adjacency(b, v, threshold))(bbox, valid)
    labels = _connected_components(adj)
    return jax.vmap(lambda b, p, c, l: _cluster_one(
        b, p, c, l, threshold, output_num, input_num,
        distinct_second=distinct_second))(bbox, pr, count, labels)


def auto_cap(max_count, sample_count, margin=1.25):
    """Serving cluster-cap policy (PERF.md round-3 cluster-cap study): the
    N^2 adjacency cost scales quadratically with the cap while any cap >=
    the observed candidate count is bitwise lossless vs the
    reference-faithful cap (10*sample_count, denet_sparse.cc:165-242 admits
    10*sample_count candidates).  Returns the next power of two >=
    margin*max_count (power-of-two caps keep the recompile set tiny if the
    cap is ever re-derived), floored at sample_count (the clustering's own
    output budget) and clamped to the reference cap.

    ``max_count`` should come from Model.calibrate_cluster_cap (measured on
    representative batches).  Serve-time saturation (count == cap) is
    detectable and escalates to the reference cap — see
    DeNetDetectLayer._get_detections_device."""
    ref_cap = 10 * sample_count
    need = max(int(numpy.ceil(margin * max(1, int(max_count)))),
               int(sample_count))
    cap = 1
    while cap < need:
        cap *= 2
    return min(cap, ref_cap)


# Expected-cost model constants, measured on v5e (PERF.md round-4 "wide
# serving profile"): clustering adds ~8.4 ms/batch-of-8 at cap 4096, i.e.
# B = 8.4e-3 / (8 * 4096^2) s per image per cap^2; the cap-independent
# pipeline floor is ~1.7x the counting prefix (15.0 ms full pipeline vs
# 8.7 ms trunk+corner+search) — 1.8 used as a conservative estimate.
_CAP_B_PER_IMAGE = 6.3e-11
_CAP_FLOOR_OVER_PREFIX = 1.8


def auto_cap_opt(batch_maxima, sample_count, batch, t_prefix_s, margin=1.25):
    """Expected-cost-optimal serving cluster cap (PERF.md round-4).

    ``auto_cap``'s max-based policy is pessimistic: ONE crowded draw forces
    EVERY batch to pay the quadratic adjacency at the max-demanded cap,
    while serving escalation (DeNetDetectLayer._get_detections_device /
    get_detections_batched) already makes any cap lossless by re-running
    the rare saturated batch at the reference cap.  The optimal default
    therefore minimizes expected time over the calibration distribution:

        E(c) = A + B*c^2 + f(c) * (A + B*ref^2)

    where ``f(c)`` is the fraction of calibration batches whose RAW max
    candidate count reaches ``c`` — exactly the serving guard's escalation
    rule (count >= cap), so f is the true escalation frequency on the
    calibration distribution.  Do NOT margin-scale f: escalation already
    makes every unseen-data outcome lossless, so inflating predicted
    escalations only re-buys safety the guard provides for free (the
    first A/B run of this policy picked cap 4096 for a distribution whose
    maxima all fit 2048 with zero escalations — a ~27%% serving loss).
    ``margin`` is accepted for signature parity with auto_cap but unused:
    drift headroom is exactly what escalation provides (results stay
    exact; under PERSISTENT drift the right response is recalibration —
    rerun calibrate_cluster_cap / serve with capCalib — not a permanently
    larger cap).  ``B`` is the measured quadratic clustering coefficient,
    ``A`` the cap-independent pipeline floor estimated from the timed
    counting prefix ``t_prefix_s`` (seconds/batch).  Escalation keeps the
    result EXACT no matter how wrong the estimates are — the policy only
    moves time, never detections.

    Candidate caps are powers of two >= sample_count (the clustering
    output budget) UNION lane-aligned multiples of 256 (the adjacency is
    pure XLA compare/min over (B, N, N) — any N that tiles the 128-lane
    VPU cleanly is as fast per element as a power of two, and the 256
    grid halves the worst-case quadratic overshoot: wide34_v2's observed
    max 2283 caps at 2304 instead of 4096, a ~3x smaller N^2 term), plus
    the reference cap itself (where escalation is impossible, so f is
    forced to 0)."""
    if margin != 1.25:
        # accepted for signature parity with auto_cap but deliberately
        # unused (escalation supersedes drift headroom) — a caller passing
        # a non-default margin expects headroom it will not get, so say so
        # instead of silently discarding it (ADVICE r4)
        import warnings
        warnings.warn("auto_cap_opt ignores margin=%r: the opt policy "
                      "relies on saturation escalation, not headroom; use "
                      "policy='max' for margin-scaled caps" % (margin,),
                      stacklevel=2)
    del margin
    ref_cap = 10 * sample_count
    maxima = sorted(int(m) for m in batch_maxima) or [0]
    a_est = _CAP_FLOOR_OVER_PREFIX * float(t_prefix_s)
    b_coef = _CAP_B_PER_IMAGE * int(batch)
    t_ref = a_est + b_coef * ref_cap * ref_cap
    cset = set()
    c = 1
    while c < ref_cap:
        if c >= sample_count:
            cset.add(c)
        c *= 2
    c = 256
    while c < ref_cap:
        if c >= sample_count:
            cset.add(c)
        c += 256
    cands = sorted(cset)
    cands.append(ref_cap)
    best, best_e = None, None
    for c in cands:
        if c == ref_cap:
            f = 0.0
        else:
            f = sum(1 for m in maxima if m >= c) / len(maxima)
        e = a_est + b_coef * c * c + f * t_ref
        if best_e is None or e < best_e - 1e-12:
            best, best_e = c, e
    return best


def cluster_candidates_host_format(bbox, pr, count, threshold, input_num,
                                   output_num):
    """Drop-in signature match for ops.native.cluster_samples (tests)."""
    b, p, c = cluster_candidates(jnp.asarray(bbox), jnp.asarray(pr),
                                 jnp.asarray(numpy.asarray(count,
                                                           numpy.int32)),
                                 float(threshold), int(output_num),
                                 int(input_num))
    return numpy.asarray(b), numpy.asarray(p), numpy.asarray(c)
