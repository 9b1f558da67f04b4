"""Micro-times the primitives inside ops/cluster_device on the real chip:
batched scatter-add / scatter-set / scatter-min, argsort, top_k, one masked
min-reduce hook iteration (where-form vs arithmetic-form), and the fused
adjacency build — at the candidate caps that matter (1536 / 2304 / 5760).
Drives the choice of formulation for the v2 fused pipeline."""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

_keep = []


def timeit(name, fn, args, iters=30):
    fn = jax.jit(fn)
    _keep.append(fn)
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print("%-34s %7.3f ms/batch" % (name, 1000 * dt), flush=True)


def main():
    b = 8
    for n in (1536, 2304, 5760):
        rng = numpy.random.RandomState(0)
        labels = jnp.asarray(rng.randint(0, n, (b, n)).astype(numpy.int32))
        vals = jnp.asarray(rng.uniform(0, 1, (b, n)).astype(numpy.float32))
        keys = jnp.asarray(rng.randint(0, n * n, (b, n)).astype(numpy.int32))
        adj = jnp.asarray(rng.uniform(0, 1, (b, n, n)) < 0.01)
        x0 = rng.uniform(0, 0.75, (b, n)).astype(numpy.float32)
        y0 = rng.uniform(0, 0.75, (b, n)).astype(numpy.float32)
        w = rng.uniform(0.02, 0.25, (b, n)).astype(numpy.float32)
        bbox = jnp.asarray(numpy.stack([x0, y0, x0 + w, y0 + w], axis=-1))
        print("--- N=%d b=%d ---" % (n, b), flush=True)

        timeit("scatter-add (sizes)", jax.vmap(
            lambda l: jnp.zeros(n, jnp.int32).at[l].add(1)), (labels,))
        timeit("scatter-min", jax.vmap(
            lambda l, v: jnp.full(n, 2.0).at[l].min(v)), (labels, vals))
        timeit("scatter-set (rank)", jax.vmap(
            lambda l: jnp.zeros(n, jnp.int32).at[l].set(
                jnp.arange(n, dtype=jnp.int32))), (labels,))
        timeit("argsort i32", jax.vmap(lambda k: jnp.argsort(k)), (keys,))
        timeit("top_k 576", jax.vmap(
            lambda k: jax.lax.top_k(k, 576)[1]), (keys,))
        timeit("hook min (where form)", jax.vmap(
            lambda a, l: jnp.min(jnp.where(a, l[None, :], n), axis=1)),
            (adj, labels))
        timeit("hook min (arith i32)", jax.vmap(
            lambda a, l: jnp.min(l[None, :] | ((~a) * jnp.int32(0x7FFFFFF)),
                                 axis=1)), (adj, labels))
        timeit("hook min (f32 where)", jax.vmap(
            lambda a, l: jnp.min(jnp.where(a, l[None, :].astype(jnp.float32),
                                           jnp.float32(n)), axis=1)),
            (adj, labels))
        timeit("adjacency fused (bool out)", jax.vmap(
            lambda bb: _adj(bb, 0.7).sum(1)), (bbox,))
        timeit("gather chain x13 (compress)", jax.vmap(_compress13),
               (labels,))
    return 0


def _adj(bbox, threshold):
    area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
    dx = jnp.maximum(0.0, jnp.minimum(bbox[:, None, 2], bbox[None, :, 2]) -
                     jnp.maximum(bbox[:, None, 0], bbox[None, :, 0]))
    dy = jnp.maximum(0.0, jnp.minimum(bbox[:, None, 3], bbox[None, :, 3]) -
                     jnp.maximum(bbox[:, None, 1], bbox[None, :, 1]))
    inter = dx * dy
    iou = inter / jnp.maximum(area[:, None] + area[None, :] - inter, 1e-12)
    return iou > threshold


def _compress13(l):
    l = jnp.minimum(l, jnp.arange(l.shape[0], dtype=jnp.int32))
    for _ in range(13):
        l = l[l]
    return l


if __name__ == "__main__":
    sys.exit(main())
