"""Read-drained A/B of the cluster op on the real chip (block_until_ready
does NOT drain the axon relay — every timing window here ends in a tiny
scalar device->host read, the only trustworthy pattern on this link).

Times cluster_candidates at the v2 candidate caps on dense fields (the
worst case that made the pull-only CC run 20-25 N^2 hook passes), and
prints the S-V iteration counts."""
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
    r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]  # drain
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    numpy.asarray(jax.tree_util.tree_leaves(r)[-1]).ravel()[:1]
    dt = (time.time() - t0) / iters
    print("%-34s %7.2f ms/batch" % (name, 1000 * dt), flush=True)


def make(n, b, density, rng):
    scale = {"sparse": 0.05, "dense": 0.25}[density]
    x0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
    y0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
    w = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
    h = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
    bbox = numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1)
    pr = -numpy.sort(-rng.uniform(0.01, 1, (b, n)).astype(numpy.float32))
    return (jnp.asarray(bbox), jnp.asarray(pr),
            jnp.full((b,), n, jnp.int32))


def main():
    b = 8
    rng = numpy.random.RandomState(0)
    for n, out in ((1536, 576), (2304, 576), (5760, 576), (6144, 2304)):
        for density in ("sparse", "dense"):
            args = make(n, b, density, rng)
            fn = jax.jit(lambda bb, p, c, out=out, n=n: cd.cluster_candidates(
                bb, p, c, 0.7, out, n))
            _keep.append(fn)
            timeit("N=%d out=%d %s" % (n, out, density), fn, args)

            # S-V iteration count on the same field
            def iters_fn(bb, c, n=n):
                idx = jnp.arange(n, dtype=jnp.int32)
                v = idx < c
                adj = cd._adjacency(bb, v, 0.7)
                jumps = max(1, int(numpy.ceil(numpy.log2(n))))

                def body(state):
                    labels, _, it = state
                    neigh = jnp.min(jnp.where(adj, labels[None, :], n), 1)
                    vv = jnp.minimum(labels, neigh.astype(jnp.int32))
                    new = labels.at[labels].min(vv)
                    for _ in range(jumps):
                        new = new[new]
                    return new, jnp.any(new != labels), it + 1

                _, _, it = jax.lax.while_loop(
                    lambda s: s[1], body, (idx, jnp.bool_(True), 0))
                return it

            jfn = jax.jit(jax.vmap(iters_fn))
            _keep.append(jfn)
            it = numpy.asarray(jfn(args[0], args[2]))
            print("  S-V iterations: %s" % it.tolist(), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
