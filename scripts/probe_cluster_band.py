"""Decompose the cluster_device cost at the round-4 serving cap (N=4096)
and measure banded-hook primitives, to decide whether an exact banded
clustering (x-sorted window + big-box global tier + overflow escalation)
can beat the dense N^2 path.

Stages timed (b8, f32, realistic hard-distribution-like geometry incl.
large boxes):
  dense adjacency build        (B,N,N) bool materialization
  dense adjacency + CC         the shipped path
  CC iteration count           while_loop trip count on this geometry
  full cluster_candidates      end-to-end shipped op
  band gather (N,W) labels     one (B,N,W) label gather (the banded hook's
                               per-iteration primitive)
  band hook x5                 5 iterations of gather+masked-min+scatter-min
                               (no adjacency build — upper-bound win probe)
  band adjacency build         (B,N,W) IoU>th against i+1..i+W neighbors

Run on the TPU (takes bench_lock; the queue yields):
    python -u scripts/probe_cluster_band.py
"""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from denet_tpu.ops import cluster_device as cd

_keep = []


def timeit(name, fn, args, iters=8):
    print("  [%s] compiling %s ..." % (time.strftime("%H:%M:%S"), name),
          flush=True)
    fn = jax.jit(fn)
    _keep.append(fn)
    t_c = time.time()
    r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]
    print("  [%s] warm (%.0fs), timing ..." % (time.strftime("%H:%M:%S"),
                                               time.time() - t_c),
          flush=True)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print("%-28s %7.2f ms/batch" % (name, 1000 * dt), flush=True)
    return dt


def hard_boxes(rng, b, n):
    """Hard-distribution-like candidate geometry: mostly small boxes in
    crowded clusters + a tail of large (up to 0.95-frame) boxes, mirroring
    data/synthetic.py make_batch_hard's graded scales."""
    # 85% small boxes clumped around crowd centers, 15% medium/large
    n_small = int(n * 0.85)
    centers = rng.uniform(0.1, 0.9, (b, 12, 2)).astype(numpy.float32)
    which = rng.randint(0, 12, (b, n_small))
    cxy = numpy.take_along_axis(
        centers, which[..., None].repeat(2, -1), axis=1)
    cxy = cxy + rng.normal(0, 0.04, cxy.shape).astype(numpy.float32)
    wh_s = rng.uniform(0.015, 0.12, (b, n_small, 2)).astype(numpy.float32)
    n_big = n - n_small
    cxy_b = rng.uniform(0.2, 0.8, (b, n_big, 2)).astype(numpy.float32)
    wh_b = rng.uniform(0.12, 0.95, (b, n_big, 2)).astype(numpy.float32)
    cxy = numpy.concatenate([cxy, cxy_b], axis=1)
    wh = numpy.concatenate([wh_s, wh_b], axis=1)
    x0 = numpy.clip(cxy[..., 0] - wh[..., 0] / 2, 0, 1)
    y0 = numpy.clip(cxy[..., 1] - wh[..., 1] / 2, 0, 1)
    x1 = numpy.clip(cxy[..., 0] + wh[..., 0] / 2, 0, 1)
    y1 = numpy.clip(cxy[..., 1] + wh[..., 1] / 2, 0, 1)
    bbox = numpy.stack([x0, y0, x1, y1], axis=-1)
    perm = rng.permutation(n)            # candidates arrive pr-ordered,
    return bbox[:, perm]                 # geometrically shuffled


def main():
    if "--cpu" in sys.argv:      # sanity runs: force CPU like conftest
        sys.argv.remove("--cpu")  # (env JAX_PLATFORMS is overridden by the
        jax.config.update("jax_platforms", "cpu")   # axon sitecustomize)
        return _main()            # no chip: skip the bench lock
    from denet_tpu.utils.chiplock import bench_lock
    with bench_lock(log=lambda m: print(m, flush=True)):
        return _main()


def _main():
    b = 8
    th = 0.7
    sizes = ((4096, 512), (2048, 512))
    if len(sys.argv) > 2:                  # probe_cluster_band.py N W
        sizes = ((int(sys.argv[1]), int(sys.argv[2])),)
    for n, w in sizes:
        rng = numpy.random.RandomState(0)
        bbox = jnp.asarray(hard_boxes(rng, b, n))
        pr = jnp.asarray(-numpy.sort(-rng.uniform(0.01, 1, (b, n))
                                     .astype(numpy.float32)))
        count = jnp.full((b,), n, jnp.int32)
        valid = jnp.ones((b, n), bool)
        idx = jnp.arange(n, dtype=jnp.int32)
        print("--- N=%d W=%d b=%d ---" % (n, w, b), flush=True)
        # pay the one-time d2h link transition before any timed window
        numpy.asarray(jnp.zeros(8) + 1.0)
        print("  link transition done", flush=True)

        timeit("dense adjacency", lambda bb, v: jax.vmap(
            lambda b_, v_: cd._adjacency(b_, v_, th))(bb, v).sum(2),
            (bbox, valid))
        timeit("dense adjacency+CC", lambda bb, v: cd._connected_components(
            jax.vmap(lambda b_, v_: cd._adjacency(b_, v_, th))(bb, v)),
            (bbox, valid))

        def cc_iters(bb, v):
            adj = jax.vmap(lambda b_, v_: cd._adjacency(b_, v_, th))(bb, v)
            off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]

            def body(state):
                labels, _, it = state
                neigh = jnp.min(jnp.where(adj, labels[:, None, :], n),
                                axis=2)
                new = jnp.minimum(labels, neigh.astype(jnp.int32))
                new = new.reshape(-1).at[(new + off).reshape(-1)].min(
                    new.reshape(-1)).reshape(b, n)
                for _ in range(2):
                    new = new.reshape(-1)[(new + off).reshape(-1)].reshape(
                        b, n)
                return new, jnp.any(new != labels), it + 1

            l0 = jnp.broadcast_to(idx, (b, n))
            _, _, it = jax.lax.while_loop(
                lambda s: s[1], body, (l0, jnp.bool_(True), 0))
            return it

        it = jax.jit(cc_iters)(bbox, valid)
        print("CC iterations: %s" % int(numpy.asarray(it)), flush=True)

        timeit("full cluster_candidates",
               lambda bb, p, c: cd.cluster_candidates(bb, p, c, th, 576, n),
               (bbox, pr, count))

        # ---- banded primitives ----
        off = (jnp.arange(b, dtype=jnp.int32) * n)[:, None, None]
        nbr = idx[:, None] + jnp.arange(1, w + 1)[None, :]   # (N,W)
        nbr_c = jnp.minimum(nbr, n - 1)
        in_rng = (nbr < n)

        def band_gather(labels):
            flat = labels.reshape(-1)
            return flat[(nbr_c[None] + off).reshape(-1)].reshape(b, n, w)

        timeit("band label gather (N,W)",
               lambda l: band_gather(l).sum(2),
               (jnp.broadcast_to(idx, (b, n)),))

        def band_adj_build(bb):
            def one(sb):
                nb = sb[nbr_c]                       # (N,W,4)
                dx = jnp.maximum(0.0, jnp.minimum(sb[:, None, 2],
                                                  nb[..., 2]) -
                                 jnp.maximum(sb[:, None, 0], nb[..., 0]))
                dy = jnp.maximum(0.0, jnp.minimum(sb[:, None, 3],
                                                  nb[..., 3]) -
                                 jnp.maximum(sb[:, None, 1], nb[..., 1]))
                inter = dx * dy
                area = (sb[:, 2] - sb[:, 0]) * (sb[:, 3] - sb[:, 1])
                nar = (nb[..., 2] - nb[..., 0]) * (nb[..., 3] - nb[..., 1])
                iou = inter / jnp.maximum(area[:, None] + nar - inter,
                                          1e-12)
                return (iou > th) & in_rng
            return jax.vmap(one)(bb).sum(2)

        timeit("band adjacency build", band_adj_build, (bbox,))

        def band_hook5(bb):
            def one(sb):
                nb = sb[nbr_c]
                dx = jnp.maximum(0.0, jnp.minimum(sb[:, None, 2],
                                                  nb[..., 2]) -
                                 jnp.maximum(sb[:, None, 0], nb[..., 0]))
                dy = jnp.maximum(0.0, jnp.minimum(sb[:, None, 3],
                                                  nb[..., 3]) -
                                 jnp.maximum(sb[:, None, 1], nb[..., 1]))
                inter = dx * dy
                area = (sb[:, 2] - sb[:, 0]) * (sb[:, 3] - sb[:, 1])
                nar = (nb[..., 2] - nb[..., 0]) * (nb[..., 3] - nb[..., 1])
                iou = inter / jnp.maximum(area[:, None] + nar - inter,
                                          1e-12)
                return (iou > th) & in_rng
            adj = jax.vmap(one)(bb)                  # (B,N,W)
            labels = jnp.broadcast_to(idx, (b, n))
            fidx = (nbr_c[None] + off).reshape(-1)
            offr = (jnp.arange(b, dtype=jnp.int32) * n)[:, None]

            def body(i, labels):
                nl = labels.reshape(-1)[fidx].reshape(b, n, w)
                pulled = jnp.min(jnp.where(adj, nl, n), axis=2)
                v = jnp.minimum(labels, pulled.astype(jnp.int32))
                # push: scatter-min v into band neighbors
                push_v = jnp.where(adj, v[:, :, None], n).astype(jnp.int32)
                fl = v.reshape(-1).at[fidx].min(push_v.reshape(-1))
                new = fl.reshape(b, n)
                # root aggregate + 2 pointer jumps (as dense path)
                new = new.reshape(-1).at[(new + offr).reshape(-1)].min(
                    new.reshape(-1)).reshape(b, n)
                for _ in range(2):
                    new = new.reshape(-1)[(new + offr).reshape(-1)] \
                        .reshape(b, n)
                return new

            return jax.lax.fori_loop(0, 5, body, labels)

        timeit("band hook x5 (adj+5 iters)", band_hook5, (bbox,))
    return 0


if __name__ == "__main__":
    sys.exit(main())
