"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy
import pytest

from denet_tpu.ops.sparse_gather import sparse_gather
from denet_tpu.ops.sparse_gather_pallas import sparse_gather_pallas


def random_inputs(rng, b=2, f=8, h=16, w=16, sn=4):
    feat = rng.uniform(-3, 3, (b, f, h, w)).astype(numpy.float32)
    bbox = numpy.zeros((b, sn, sn, 4), dtype=numpy.float32)
    for bi in range(b):
        for j in range(sn):
            for i in range(sn):
                x0, y0 = rng.uniform(0, 1, 2)
                bbox[bi, j, i] = [x0, y0, rng.uniform(x0, 1),
                                  rng.uniform(y0, 1)]
    return jnp.asarray(feat), jnp.asarray(bbox)


@pytest.mark.parametrize("gs", [1, 3])
def test_pallas_gather_matches_xla(gs):
    rng = numpy.random.RandomState(0)
    feat, bbox = random_inputs(rng)
    ref = sparse_gather(feat, bbox, gs)
    out = sparse_gather_pallas(feat, bbox, gs, True)
    assert numpy.allclose(numpy.asarray(out), numpy.asarray(ref), atol=1e-5)


def test_pallas_gather_grad_matches_xla():
    rng = numpy.random.RandomState(1)
    feat, bbox = random_inputs(rng, b=1, f=4, h=8, w=8, sn=2)
    gs = 2

    def loss_pallas(ft, bb):
        return jnp.sum(sparse_gather_pallas(ft, bb, gs, True) ** 2)

    def loss_xla(ft, bb):
        return jnp.sum(sparse_gather(ft, bb, gs) ** 2)

    g_p = jax.grad(loss_pallas, argnums=(0, 1))(feat, bbox)
    g_x = jax.grad(loss_xla, argnums=(0, 1))(feat, bbox)
    assert numpy.allclose(numpy.asarray(g_p[0]), numpy.asarray(g_x[0]),
                          atol=1e-4)
    assert numpy.allclose(numpy.asarray(g_p[1]), numpy.asarray(g_x[1]),
                          atol=1e-4)


def test_pallas_gather_bf16():
    rng = numpy.random.RandomState(2)
    feat, bbox = random_inputs(rng)
    feat16 = feat.astype(jnp.bfloat16)
    out = sparse_gather_pallas(feat16, bbox, 3, True)
    ref = sparse_gather(feat16, bbox, 3)
    assert out.dtype == jnp.bfloat16
    assert numpy.allclose(numpy.asarray(out, dtype=numpy.float32),
                          numpy.asarray(ref, dtype=numpy.float32), atol=1e-2)
