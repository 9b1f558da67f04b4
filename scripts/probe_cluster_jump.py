"""Read-drained A/B: vmapped per-image gather l[l] vs one flat gather over
the batch (indices offset per image).  Plus candidate full-CC variants:
scatter + k flat-jumps per iteration, at caps 1536/2304/5760."""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from denet_tpu.ops.cluster_device import _adjacency

_keep = []
B = 8


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
    print("%-40s %7.2f ms/batch" % (name, 1000 * dt), flush=True)
    return dt


def main():
    for n in (2304, 5760):
        rng = numpy.random.RandomState(0)
        labels0 = jnp.asarray(rng.randint(0, n, (B, n)).astype(numpy.int32))
        off = (jnp.arange(B, dtype=jnp.int32) * n)[:, None]
        print("--- N=%d b=%d ---" % (n, B), flush=True)

        def vmap_jumps(l0):
            def body(_, l):
                for _ in range(13):
                    l = jax.vmap(lambda a: a[a])(l)
                return l
            return jax.lax.fori_loop(0, 4, body, l0).min()

        def flat_jumps(l0):
            def body(_, l):
                for _ in range(13):
                    l = l.reshape(-1)[(l + off).reshape(-1)].reshape(B, n)
                return l
            return jax.lax.fori_loop(0, 4, body, l0).min()

        def onehot_jump(l0):
            # l[l] via take_along_axis (may lower differently than vmap)
            def body(_, l):
                for _ in range(13):
                    l = jnp.take_along_axis(l, l, axis=1)
                return l
            return jax.lax.fori_loop(0, 4, body, l0).min()

        timeit("4x13 jump vmap", vmap_jumps, (labels0,))
        timeit("4x13 jump flat", flat_jumps, (labels0,))
        timeit("4x13 jump take_along_axis", onehot_jump, (labels0,))

        # full CC candidates on dense boxes
        scale = 0.25
        x0 = rng.uniform(0, 1 - scale, (B, n)).astype(numpy.float32)
        y0 = rng.uniform(0, 1 - scale, (B, n)).astype(numpy.float32)
        w = rng.uniform(0.02, scale, (B, n)).astype(numpy.float32)
        h = rng.uniform(0.02, scale, (B, n)).astype(numpy.float32)
        bbox = jnp.asarray(numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1))
        valid = jnp.ones((B, n), bool)
        idx = jnp.arange(n, dtype=jnp.int32)

        def cc(jumps_k, use_scatter):
            def run(bb, v):
                adj = jax.vmap(lambda b_, v_: _adjacency(b_, v_, 0.7))(
                    bb, v)

                def body(state):
                    l, _, adj_c = state
                    neigh = jnp.min(jnp.where(adj_c, l[:, None, :], n),
                                    axis=2)
                    vv = jnp.minimum(l, neigh.astype(jnp.int32))
                    if use_scatter:
                        l = jax.vmap(lambda a, b_: a.at[a].min(b_))(l, vv)
                    else:
                        l = vv
                    for _ in range(jumps_k):
                        l = l.reshape(-1)[(l + off).reshape(-1)].reshape(
                            B, n)
                    return l, jnp.any(l != state[0]), adj_c

                l0 = jnp.broadcast_to(idx, (B, n))
                l, _, _ = jax.lax.while_loop(
                    lambda s: s[1], body, (l0, jnp.bool_(True), adj))
                return l.min()

            return run

        timeit("CC scatter+2flatjump", cc(2, True), (bbox, valid))
        timeit("CC scatter+4flatjump", cc(4, True), (bbox, valid))
        timeit("CC pull+2flatjump", cc(2, False), (bbox, valid))
    return 0


if __name__ == "__main__":
    sys.exit(main())
