"""Trainer tests: solver math vs hand-computed references, convergence."""
import jax.numpy as jnp
import numpy

from denet_tpu.core.model import Model
from denet_tpu.train import solver as solver_mod
from denet_tpu.train.trainer import Trainer


def test_sgd_update_math():
    """m = rho*m + (1-rho)*g ; p -= lr*m, with rho gated at iteration 0."""
    p = {"w": jnp.asarray([1.0, 2.0])}
    g = {"w": jnp.asarray([0.5, -0.5])}
    roles = {"w": "weight"}
    slots = solver_mod.init_slots(p, "sgd")

    # iteration 0: rho forced to 0 -> m = g, p -= lr*g
    p1, s1 = solver_mod.apply_updates("sgd", p, g, slots, roles, 0.1,
                                      [0.9, 0.999], 0.0, 0)
    assert numpy.allclose(p1["w"], [1.0 - 0.05, 2.0 + 0.05])
    assert numpy.allclose(s1["m"]["w"], [0.5, -0.5])

    # iteration 1: m = 0.9*m + 0.1*g
    p2, s2 = solver_mod.apply_updates("sgd", p1, g, s1, roles, 0.1,
                                      [0.9, 0.999], 0.0, 1)
    m_expect = 0.9 * numpy.array([0.5, -0.5]) + 0.1 * numpy.array([0.5, -0.5])
    assert numpy.allclose(s2["m"]["w"], m_expect)
    assert numpy.allclose(p2["w"], numpy.asarray(p1["w"]) - 0.1 * m_expect)


def test_torch_update_math():
    """m = rho*m + g ; p -= lr*(g + mom*m)  (nesterov/torch mode)."""
    p = {"w": jnp.asarray([1.0])}
    g = {"w": jnp.asarray([1.0])}
    roles = {"w": "weight"}
    slots = solver_mod.init_slots(p, "torch")
    p1, s1 = solver_mod.apply_updates("torch", p, g, slots, roles, 0.1,
                                      [0.9, 0.999], 0.0, 5)
    # m starts 0 but iteration>0: m = 0.9*0 + 1 = 1 ; p -= 0.1*(1 + 0.9*1)
    assert numpy.allclose(s1["m"]["w"], [1.0])
    assert numpy.allclose(p1["w"], [1.0 - 0.19])


def test_weight_decay_only_on_weights():
    p = {"w": jnp.asarray([1.0]), "bias": jnp.asarray([1.0])}
    g = {"w": jnp.asarray([0.0]), "bias": jnp.asarray([0.0])}
    roles = {"w": "weight", "bias": "bias"}
    slots = solver_mod.init_slots(p, "sgd")
    p1, _ = solver_mod.apply_updates("sgd", p, g, slots, roles, 1.0,
                                     [0.0, 0.0], 0.1, 0)
    assert numpy.allclose(p1["w"], [0.9])      # decayed
    assert numpy.allclose(p1["bias"], [1.0])   # untouched


class FakeDataset:
    """Minimal dataset exposing the export() contract."""

    def __init__(self, x, labels):
        self.x = x
        self.labels = labels

    def export(self, batch_size):
        metas = [{"image_class": int(l)} for l in self.labels]
        return self.x, metas, len(self.labels)


def test_training_reduces_cost():
    numpy.random.seed(11)
    model = Model()
    model.batch_size = 8
    model.class_num = 2
    model.class_labels = {"0": 0, "1": 1}
    model.build(["C[8,3]", "BN", "A", "P[2]", "R"], (1, 8, 8),
                border_mode="half", weight_init=["he-forward"])

    # two trivially separable classes, interleaved so each batch mixes both
    # (BN with single-class batches would wash out the signal)
    x = numpy.zeros((16, 1, 8, 8), dtype=numpy.float32)
    labels = numpy.zeros(16, dtype=numpy.int64)
    x[8:, :, :4] = 1.0
    labels[8:] = 1
    perm = numpy.arange(16).reshape(2, 8).T.reshape(-1)
    x, labels = x[perm], labels[perm]
    data = FakeDataset(x, labels)

    trainer = Trainer(model, solver_mode="sgd", seed=3)
    cost0 = trainer.train_epoch(data, 0, learning_rate=0.1, momentum=[0.9, 0.999])
    for epoch in range(1, 6):
        cost = trainer.train_epoch(data, epoch, 0.1, momentum=[0.9, 0.999])
    assert cost < cost0

    preds = model.predict_label(data)
    acc = numpy.mean(numpy.asarray(preds) == labels)
    assert acc >= 0.9


def test_adam_training_runs():
    numpy.random.seed(12)
    model = Model()
    model.batch_size = 4
    model.class_num = 2
    model.class_labels = {"0": 0, "1": 1}
    model.build(["C[4,3]", "A", "R"], (1, 6, 6), border_mode="half",
                weight_init=["he-forward"])
    x = numpy.random.uniform(0, 1, (4, 1, 6, 6)).astype(numpy.float32)
    data = FakeDataset(x, [0, 1, 0, 1])
    trainer = Trainer(model, solver_mode="adam", seed=5)
    c = trainer.train_epoch(data, 0, 0.001, momentum=[0.9, 0.999])
    assert numpy.isfinite(c)


def test_grad_accum_acc_mode():
    numpy.random.seed(13)
    model = Model()
    model.batch_size = 4
    model.class_num = 2
    model.class_labels = {"0": 0, "1": 1}
    model.build(["C[4,3]", "R"], (1, 6, 6), border_mode="half",
                weight_init=["he-forward"])
    x = numpy.random.uniform(0, 1, (4, 1, 6, 6)).astype(numpy.float32)
    metas = [{"image_class": i % 2} for i in range(4)]
    trainer = Trainer(model, solver_mode="sgd", use_acc_mode=True, seed=5)
    trainer.train_begin()
    for i in range(3):
        trainer.train_step(x, metas, 0, i, 0.1, [0.9, 0.999], 0.0)
    trainer.train_end()
    assert numpy.all(numpy.isfinite(
        numpy.asarray(model.params[1]["weight"])))


def test_adam_update_math():
    """Adam with bias correction by (iteration + 1) — model_cnn.py:296-305."""
    p = {"w": jnp.asarray([1.0])}
    g = {"w": jnp.asarray([0.5])}
    roles = {"w": "weight"}
    slots = solver_mod.init_slots(p, "adam")
    b1, b2, lr, it, eps = 0.9, 0.999, 0.01, 3, 1e-8

    p1, s1 = solver_mod.apply_updates("adam", p, g, slots, roles, lr,
                                      [b1, b2], 0.0, it)
    m = (1 - b1) * 0.5
    v = (1 - b2) * 0.25
    m_hat = m / (1 - b1 ** (it + 1))
    v_hat = v / (1 - b2 ** (it + 1))
    expect = 1.0 - lr * m_hat / (numpy.sqrt(v_hat) + eps)
    assert numpy.allclose(p1["w"], [expect], atol=1e-7)
    assert numpy.allclose(s1["m"]["w"], [m])
    assert numpy.allclose(s1["v"]["w"], [v])


def test_pipelined_training_classification():
    """pipeline_targets overlaps target prep with the device step; for
    classification (no sample selection) results match exactly."""
    def build():
        numpy.random.seed(11)
        model = Model()
        model.batch_size = 8
        model.class_num = 2
        model.class_labels = {"0": 0, "1": 1}
        model.build(["C[8,3]", "BN", "A", "P[2]", "R"], (1, 8, 8),
                    border_mode="half", weight_init=["he-forward"])
        return model

    x = numpy.zeros((16, 1, 8, 8), dtype=numpy.float32)
    labels = numpy.zeros(16, dtype=numpy.int64)
    x[8:, :, :4] = 1.0
    labels[8:] = 1
    perm = numpy.arange(16).reshape(2, 8).T.reshape(-1)
    data = FakeDataset(x[perm], labels[perm])

    m1 = build()
    t1 = Trainer(m1, solver_mode="sgd", seed=3)
    m2 = build()
    t2 = Trainer(m2, solver_mode="sgd", seed=3, pipeline_targets=True)
    for epoch in range(3):
        c1 = t1.train_epoch(data, epoch, 0.1, momentum=[0.9, 0.999])
        c2 = t2.train_epoch(data, epoch, 0.1, momentum=[0.9, 0.999])
    assert abs(c1 - c2) < 1e-4
    assert numpy.allclose(numpy.asarray(m1.params[1]["weight"]),
                          numpy.asarray(m2.params[1]["weight"]), atol=1e-5)


def test_pipelined_training_detection_runs():
    import random
    from tests.test_detection import build_detect_model, synthetic_batch
    random.seed(4)
    model = build_detect_model(use_bbox_reg=True)
    trainer = Trainer(model, solver_mode="sgd", seed=5, pipeline_targets=True)

    x, metas = synthetic_batch()
    xs = numpy.concatenate([x, x], axis=0)
    ms = metas + metas

    class DetData:
        def export(self, batch_size):
            return xs, ms, len(ms)

    cost = trainer.train_epoch(DetData(), 0, 0.01, momentum=[0.9, 0.999])
    assert numpy.isfinite(cost)


def test_bfloat16_training_detection():
    """Mixed-precision training: bf16 activations through conv/deconv (MXU
    path), f32 master weights and cost heads.  The backward pass previously
    failed with a conv dtype mismatch when convs forced f32 outputs."""
    import random
    import jax.numpy as jnp
    from tests.test_detection import build_detect_model, synthetic_batch

    random.seed(3)
    model = build_detect_model(use_bbox_reg=True)
    model.compute_dtype = jnp.bfloat16
    trainer = Trainer(model, solver_mode="nesterov", seed=2)
    x, metas = synthetic_batch()
    costs = []
    for it in range(4):
        cost, _ = trainer.train_step(x, metas, 0, it, 0.02, [0.9, 0.999], 0.0)
        assert numpy.isfinite(cost)
        costs.append(cost)
    assert costs[-1] < costs[0]
    # master weights stay f32 through the bf16 compute path
    import jax
    for v in jax.tree_util.tree_leaves(model.params):
        if hasattr(v, "dtype") and v.dtype.kind == "f":
            assert str(v.dtype) == "float32", str(v.dtype)


def test_no_remat_matches_remat():
    """Disabling split-mode rematerialization (Trainer(use_remat=False),
    CLI --no-remat) must not change the numerics — remat trades memory for
    recompute only."""
    import random
    from tests.test_parallel import make_model as _  # noqa: F401 (import check)
    from tests.test_detection import synthetic_batch

    def run(use_remat):
        import numpy as np
        np.random.seed(11)
        random.seed(11)
        model = Model()
        model.batch_size = 2
        model.class_num = 3
        model.class_labels = {str(i): i for i in range(3)}
        desc = ["C[8,3]", "BN", "A", "SPLIT", "C[8,3]", "BN", "A", "SPLIT",
                "R"]
        model.build(desc, (3, 16, 16), border_mode="half",
                    weight_init=["he-forward"])
        assert model.use_split_mode
        trainer = Trainer(model, solver_mode="nesterov", seed=4,
                          use_remat=use_remat)
        x, metas = synthetic_batch()
        out = []
        for it in range(3):
            cost, _c = trainer.train_step(x, metas, 0, it, 0.05,
                                          [0.9, 0.999], 1e-4)
            out.append(cost)
        return out, model.params

    import jax
    c1, p1 = run(None)     # remat at SPLIT boundaries
    c2, p2 = run(False)    # no remat
    assert c1 == c2
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        assert numpy.array_equal(numpy.asarray(a), numpy.asarray(b))


def test_pipelined_epoch_block_reads_match_per_step_reads():
    """cost_read_interval>1 reads cost scalars in stacked blocks; the epoch
    total and the trained parameters must be identical to interval=1 (the
    read cadence is an IO optimization, not a semantic change)."""
    def build():
        numpy.random.seed(21)
        model = Model()
        model.batch_size = 4
        model.class_num = 2
        model.class_labels = {"0": 0, "1": 1}
        model.build(["C[4,3]", "BN", "A", "P[2]", "R"], (1, 8, 8),
                    border_mode="half", weight_init=["he-forward"])
        return model

    x = numpy.random.RandomState(5).uniform(
        0, 1, (12, 1, 8, 8)).astype(numpy.float32)
    labels = numpy.arange(12) % 2
    data = FakeDataset(x, labels)

    totals, finals = [], []
    for interval in (1, 4):
        model = build()
        trainer = Trainer(model, solver_mode="nesterov", seed=3,
                          pipeline_targets=True,
                          cost_read_interval=interval)
        total = 0.0
        for epoch in range(2):
            total += trainer.train_epoch(data, epoch, 0.05,
                                         momentum=[0.9, 0.999])
        totals.append(total)
        finals.append(numpy.asarray(model.params[1]["weight"]))
    assert abs(totals[0] - totals[1]) < 1e-5, totals
    assert numpy.array_equal(finals[0], finals[1])
