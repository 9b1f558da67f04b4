"""Decompose ops/cluster_device cost on the real chip: adjacency build,
batched connected components, rank/quota bookkeeping, and the scatter
pack-out are timed cumulatively at the v2 candidate caps.  Identifies which
stage holds the per-batch floor the end-to-end bench measures."""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from denet_tpu.ops import cluster_device as cd

_keep = []


def timeit(name, fn, args, iters=20):
    fn = jax.jit(fn)
    _keep.append(fn)
    r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print("%-28s %7.2f ms/batch" % (name, 1000 * dt), flush=True)


def main():
    b = 8
    for n, out in ((1536, 576), (2304, 576), (5760, 576)):
        rng = numpy.random.RandomState(0)
        x0 = rng.uniform(0, 0.75, (b, n)).astype(numpy.float32)
        y0 = rng.uniform(0, 0.75, (b, n)).astype(numpy.float32)
        w = rng.uniform(0.02, 0.25, (b, n)).astype(numpy.float32)
        h = rng.uniform(0.02, 0.25, (b, n)).astype(numpy.float32)
        bbox = jnp.asarray(numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1))
        pr = jnp.asarray(-numpy.sort(-rng.uniform(0.01, 1, (b, n))
                                     .astype(numpy.float32)))
        count = jnp.full((b,), n, jnp.int32)
        valid = jnp.ones((b, n), bool)
        idx = jnp.arange(n, dtype=jnp.int32)
        print("--- N=%d out=%d b=%d ---" % (n, out, b), flush=True)

        timeit("adjacency", lambda bb, v: jax.vmap(
            lambda b_, v_: cd._adjacency(b_, v_, 0.7))(bb, v).sum(2),
            (bbox, valid))
        timeit("adjacency+CC", lambda bb, v: cd._connected_components(
            jax.vmap(lambda b_, v_: cd._adjacency(b_, v_, 0.7))(bb, v)),
            (bbox, valid))

        def cc_iters(bb, v):
            adj = jax.vmap(lambda b_, v_: cd._adjacency(b_, v_, 0.7))(bb, v)
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

        def upto_ranks(bb, p, c):
            v = idx[None, :] < c[:, None]
            adj = jax.vmap(lambda b_, v_: cd._adjacency(b_, v_, 0.7))(bb, v)
            labels = cd._connected_components(adj)

            def ranks_one(labels, v):
                sizes = jnp.zeros(n, jnp.int32).at[labels].add(
                    v.astype(jnp.int32))
                is_rep = v & (labels == idx)
                key = jnp.where(is_rep, sizes * n - idx, -1)
                order = jnp.argsort(-key)
                rank = jnp.zeros(n, jnp.int32).at[order].set(
                    jnp.arange(n, dtype=jnp.int32))
                morder = jnp.argsort(jnp.where(v, labels, n), stable=True)
                return rank.sum() + morder.sum()

            return jax.vmap(ranks_one)(labels, v)

        timeit("+sizes/rep/sort-rank", upto_ranks, (bbox, pr, count))
        timeit("full cluster", lambda bb, p, c: cd.cluster_candidates(
            bb, p, c, 0.7, out, n), (bbox, pr, count))
    return 0


if __name__ == "__main__":
    sys.exit(main())
