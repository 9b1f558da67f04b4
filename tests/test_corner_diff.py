"""CPU regression tests for the round-5 corner-diff DCE.

`DeNetCornerLayer` collects `corner_diff = 2z` directly (the
log_softmax([z,-z]) difference cancels algebraically), letting XLA
dead-code-eliminate the exp/log tree from every inference jit
(denet_tpu/layers/denet_corner.py:64-75).  The TPU A/B
(scripts/ab_cornerdiff.py) measured +16.5% on wide models with
bitwise-identical detections; these tests pin the algebraic parity and
the end-to-end detection parity on CPU so the shipped default can never
drift from the legacy `DENET_TPU_CORNER_DIFF=0` path.

Reference for the consumed quantity: the corner search reads
d = log pr_f - log pr_t (/root/reference/denet/layer/denet_sparse.cc
sample building); both arms must produce the same candidates.
"""
import random

import numpy
import pytest

from denet_tpu.core.model import Model


def _build(seed=21, v2=False):
    numpy.random.seed(seed)
    random.seed(seed)
    model = Model()
    model.batch_size = 2
    model.class_num = 3
    model.class_labels = {str(i): i for i in range(3)}
    dns = "DNS[2,4,0.01,0.1,2,0.7]" if v2 else "DNS[2,4,0.01,0.1]"
    desc = ["C[8,3]", "BN", "A", "DNC[16]", dns,
            "C[16,1]", "BN", "A", "DND.JB[0.5,1.0,1.0]"]
    model.build(desc, (3, 16, 16), border_mode="half",
                weight_init=["he-forward"])
    return model


def _batch(batch_size=2):
    rng = numpy.random.RandomState(11)
    x = rng.uniform(0, 1, (batch_size, 3, 16, 16)).astype(numpy.float32)
    metas = [{"bbox": [(0.1, 0.1, 0.5, 0.6)], "class": [b % 3],
              "image_class": b % 3} for b in range(batch_size)]
    return x, metas


def _detections(monkeypatch, flag, v2):
    # env is read at TRACE time inside DeNetCornerLayer.apply — a fresh
    # model (fresh jit cache) per arm guarantees the toggle takes effect
    monkeypatch.setenv("DENET_TPU_CORNER_DIFF", flag)
    model = _build(v2=v2)
    x, metas = _batch()
    detect_layer = model.layers[-1]
    return detect_layer.get_detections(model, x, metas,
                                       {"prThreshold": 0.0001,
                                        "nmsThreshold": 0.5})


def test_corner_diff_collect_matches_legacy(monkeypatch):
    """The collected 2z equals the log_softmax recomputation numerically."""
    import jax.numpy as jnp

    from denet_tpu.layers.base import Ctx

    monkeypatch.setenv("DENET_TPU_CORNER_DIFF", "1")
    model = _build()
    x, _ = _batch()
    corner = [l for l in model.layers if l.type_name == "denet-corner"][0]

    ctx = Ctx(train=False)
    outputs = {0: model.prep_input(jnp.asarray(x), ctx)}
    for i in range(1, corner.layer_index + 1):
        y, _ = model.layers[i].apply(model.params[i], model.state[i],
                                     outputs, ctx)
        outputs[i] = y
    got = ctx.collect[corner.layer_index]
    legacy = got["corner_pr"][:, 0] - got["corner_pr"][:, 1]
    numpy.testing.assert_allclose(numpy.asarray(got["corner_diff"]),
                                  numpy.asarray(legacy),
                                  rtol=0, atol=1e-5)


@pytest.mark.parametrize("v2", [False, True], ids=["v1", "v2cluster"])
def test_corner_diff_detections_match_legacy(monkeypatch, v2):
    """End-to-end get_detections parity: DCE arm == legacy arm."""
    legacy = _detections(monkeypatch, "0", v2)
    dce = _detections(monkeypatch, "1", v2)
    assert len(legacy) == len(dce)
    for rl, rd in zip(legacy, dce):
        dl = numpy.asarray(sorted(map(tuple, rl["detections"])))
        dd = numpy.asarray(sorted(map(tuple, rd["detections"])))
        assert dl.shape == dd.shape
        if dl.size:
            numpy.testing.assert_allclose(dl, dd, rtol=0, atol=1e-5)
