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
    """adj (N,N) bool -> labels (N,) i32: min sample index per component."""
    n = adj.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)

    def body(state):
        labels, _ = state
        # hook: pull the smallest neighbor label
        neigh = jnp.min(jnp.where(adj, labels[None, :], n), axis=1)
        new = jnp.minimum(labels, neigh.astype(jnp.int32))
        # pointer jumping: compress label chains
        new = new[new]
        new = new[new]
        return new, jnp.any(new != labels)

    labels, _ = jax.lax.while_loop(lambda s: s[1], body,
                                   (idx, jnp.bool_(True)))
    return labels


def _cluster_one(bbox, pr, count, threshold, output_num, input_num):
    """One image: bbox (N,4), pr (N,) sorted desc, count () ->
    (out_bbox (output_num,4), out_pr (output_num,), out_count ())."""
    n = bbox.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    valid = idx < jnp.minimum(count, input_num)
    s_total = jnp.sum(valid.astype(jnp.int32))

    adj = _adjacency(bbox, valid, threshold)
    labels = _connected_components(adj)

    # cluster sizes + representative (min index == best pr) bookkeeping
    sizes = jnp.zeros(n, dtype=jnp.int32).at[labels].add(
        valid.astype(jnp.int32))
    is_rep = valid & (labels == idx)
    c_total = jnp.sum(is_rep.astype(jnp.int32))

    # cap clusters at output_num by (size desc, representative index asc)
    my_size = sizes[idx]
    better = (is_rep[None, :] &
              ((sizes[None, :] > my_size[:, None]) |
               ((sizes[None, :] == my_size[:, None]) &
                (idx[None, :] < idx[:, None]))))
    cluster_rank = jnp.sum(better, axis=1, dtype=jnp.int32)   # rank of rep i
    kept_rep = is_rep & (cluster_rank < output_num)

    c_kept = jnp.minimum(c_total, output_num)
    # integer quota: n_c = min(size, 1 + size*(output_num-C)//(S-C))
    denom = jnp.maximum(1, s_total - c_kept)
    numer = jnp.maximum(0, output_num - c_kept)
    quota = jnp.minimum(sizes, 1 + (sizes * numer) // denom)

    # member rank within the cluster (candidates are pr-desc ordered, so
    # rank position == "best members first")
    same = (labels[None, :] == labels[:, None]) & valid[None, :]
    member_rank = jnp.sum(same & (idx[None, :] < idx[:, None]), axis=1,
                          dtype=jnp.int32)

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


@partial(jax.jit, static_argnames=("threshold", "output_num", "input_num"))
def cluster_candidates(bbox, pr, count, threshold, output_num,
                       input_num=None):
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
    return jax.vmap(lambda b, p, c: _cluster_one(
        b, p, c, threshold, output_num, input_num))(bbox, pr, count)


def cluster_candidates_host_format(bbox, pr, count, threshold, input_num,
                                   output_num):
    """Drop-in signature match for ops.native.cluster_samples (tests)."""
    b, p, c = cluster_candidates(jnp.asarray(bbox), jnp.asarray(pr),
                                 jnp.asarray(numpy.asarray(count,
                                                           numpy.int32)),
                                 float(threshold), int(output_num),
                                 int(input_num))
    return numpy.asarray(b), numpy.asarray(p), numpy.asarray(c)
