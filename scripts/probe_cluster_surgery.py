"""Surgical read-drained cost attribution for the cluster CC loop on the
real chip.  Each variant isolates one term: adjacency build, the N^2
pull-hook, the pointer-jump gathers, and the scatter-min root
aggregation — all as fori_loops with FIXED trip counts so differences are
pure marginal costs (no data-dependent iteration noise)."""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from denet_tpu.ops.cluster_device import _adjacency

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
    print("%-40s %7.2f ms/batch" % (name, 1000 * dt), flush=True)
    return dt


def main():
    b = 8
    for n in (2304, 5760):
        rng = numpy.random.RandomState(0)
        scale = 0.25
        x0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
        y0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
        w = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
        h = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
        bbox = jnp.asarray(numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1))
        valid = jnp.ones((b, n), bool)
        labels0 = jnp.asarray(
            rng.randint(0, n, (b, n)).astype(numpy.int32))
        idx = jnp.arange(n, dtype=jnp.int32)
        print("--- N=%d b=%d dense ---" % (n, b), flush=True)

        def adj_only(bb, v):
            return jax.vmap(lambda b_, v_: _adjacency(b_, v_, 0.7).sum(1)
                            .astype(jnp.int32).min())(bb, v)

        t_adj = timeit("adjacency only", adj_only, (bbox, valid))

        def mk_loop(k, jumps, scatter, axis0=False):
            def one(bb, v, l0):
                adj = _adjacency(bb, v, 0.7)

                def body(_, l):
                    if axis0:
                        neigh = jnp.min(
                            jnp.where(adj, l[:, None], n), axis=0)
                    else:
                        neigh = jnp.min(
                            jnp.where(adj, l[None, :], n), axis=1)
                    vv = jnp.minimum(l, neigh.astype(jnp.int32))
                    if scatter:
                        l = l.at[l].min(vv)
                    else:
                        l = vv
                    for _ in range(jumps):
                        l = l[l]
                    return l

                l = jax.lax.fori_loop(0, k, body, jnp.minimum(l0, idx))
                return l.min()

            return lambda bb, v, l0: jax.vmap(one)(bb, v, l0)

        t1 = timeit("adj + 1x pull-hook", mk_loop(1, 0, False),
                    (bbox, valid, labels0))
        t4 = timeit("adj + 4x pull-hook", mk_loop(4, 0, False),
                    (bbox, valid, labels0))
        timeit("adj + 4x pull-hook (axis0)", mk_loop(4, 0, False, True),
               (bbox, valid, labels0))
        timeit("adj + 4x [hook+2jump]", mk_loop(4, 2, False),
               (bbox, valid, labels0))
        timeit("adj + 4x [hook+13jump]", mk_loop(4, 13, False),
               (bbox, valid, labels0))
        timeit("adj + 4x [hook+scatter+13jump]", mk_loop(4, 13, True),
               (bbox, valid, labels0))

        def jumps_only(l0):
            def body(_, l):
                for _ in range(13):
                    l = l[l]
                return jnp.minimum(l, idx)
            return jax.vmap(
                lambda l: jax.lax.fori_loop(0, 4, body, l).min())(l0)

        timeit("4x 13jump only (no N^2)", jumps_only, (labels0,))

        def scatter_only(l0):
            def body(_, l):
                return l.at[l].min(l // 2)
            return jax.vmap(
                lambda l: jax.lax.fori_loop(0, 4, body, l).min())(l0)

        timeit("4x scatter-min only", scatter_only, (labels0,))
        print("  marginal hook: %.2f ms" % (1000 * (t4 - t1) / 3.0),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
