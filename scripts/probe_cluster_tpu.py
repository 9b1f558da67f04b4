"""Standalone timing probe of ops/cluster_device on the real chip.

Measures the traced corner-search+cluster chain at the training/inference
shapes (skip v2: N=5760 candidates, output 576) across candidate-density
regimes — diagnosing the v2full training stall (data-dependent while_loop
convergence? HBM pressure from the N^2 adjacency?).
"""
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from denet_tpu.ops.cluster_device import cluster_candidates


def main():
    b = 8
    for n, out in ((1536, 576), (5760, 576), (6144, 2304)):
        rng = numpy.random.RandomState(0)
        for density, scale in (("sparse", 0.05), ("dense", 0.25),
                               ("chain", 0.0)):
            if density == "chain":
                # worst case: one long overlap chain per image
                step = 0.4 / n
                x0 = numpy.arange(n, dtype=numpy.float32)[None] * step
                x0 = numpy.repeat(x0, b, 0)
                bbox = numpy.stack([x0, numpy.zeros_like(x0),
                                    x0 + 0.5, numpy.full_like(x0, 0.5)],
                                   axis=-1)
            else:
                x0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
                y0 = rng.uniform(0, 1 - scale, (b, n)).astype(numpy.float32)
                w = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
                h = rng.uniform(0.02, scale, (b, n)).astype(numpy.float32)
                bbox = numpy.stack([x0, y0, x0 + w, y0 + h], axis=-1)
            pr = -numpy.sort(-rng.uniform(0.01, 1, (b, n))
                             .astype(numpy.float32))
            count = numpy.full((b,), n, numpy.int32)

            args = (jnp.asarray(bbox), jnp.asarray(pr), jnp.asarray(count))
            t0 = time.time()
            r = cluster_candidates(*args, 0.7, out, n)
            c = numpy.asarray(r[2])
            t_compile = time.time() - t0
            t0 = time.time()
            iters = 10
            for _ in range(iters):
                r = cluster_candidates(*args, 0.7, out, n)
            numpy.asarray(r[2])[:1]
            dt = (time.time() - t0) / iters
            print("N=%5d out=%4d %-6s: %7.2f ms/batch (compile %.0fs, "
                  "counts %s)" % (n, out, density, 1000 * dt, t_compile,
                                  c[:3].tolist()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
