"""2-process jax.distributed CPU test: the multi-host branch of
parallel/mesh.py (init_distributed + make_array_from_process_local_data)
drives one data-parallel train step split across two processes, and the cost
matches a single-process run bit-for-bit.

Replaces (validates the replacement of) the reference's UpdateServer /
UpdateClient TCP machinery (denet/multi/update_server.py, update_client.py).
"""
import os
import socket
import subprocess
import sys

import numpy

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_SRC = r'''
import os, sys
port, pid, repo = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
from denet_tpu.parallel import mesh as mesh_mod
mesh_mod.init_distributed("localhost:" + port, 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import numpy
from denet_tpu.core.model import Model
from denet_tpu.train.trainer import Trainer

def make_model(batch_size):
    numpy.random.seed(31)
    model = Model()
    model.batch_size = batch_size
    model.class_num = 4
    model.class_labels = {str(i): i for i in range(4)}
    model.build(["C[8,3]", "BN", "A", "P[2]", "R"], (3, 16, 16),
                border_mode="half", weight_init=["he-forward"])
    return model

B = 8
numpy.random.seed(5)
x = numpy.random.uniform(0, 1, (B, 3, 16, 16)).astype(numpy.float32)
metas = [{"image_class": i % 4} for i in range(B)]
model = make_model(B)
mesh = mesh_mod.make_mesh()
trainer = Trainer(model, solver_mode="sgd", seed=7, mesh=mesh)
# each process feeds its LOCAL half of the global batch (the per-host data
# assignment that replaces the reference UpdateClient subset scheduling)
lo, hi = pid * (B // 2), (pid + 1) * (B // 2)
cost, _ = trainer.train_step(x[lo:hi], metas[lo:hi], 0, 0, 0.1,
                             [0.9, 0.999], 0.0)
w = numpy.asarray(jax.device_get(model.params[1]["weight"]))
print("MHCOST %.10f %.10f" % (cost, float(w.sum())), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_step_matches_single(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER_SRC)
    port = str(_free_port())

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-u", str(worker), port, str(pid), REPO],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MHCOST")]
        assert lines, out
        _, cost, wsum = lines[0].split()
        results.append((float(cost), float(wsum)))

    # both processes computed the same global step
    assert results[0] == results[1]

    # ... and it matches the single-process trainer on the full batch
    from denet_tpu.core.model import Model
    from denet_tpu.train.trainer import Trainer

    numpy.random.seed(31)
    model = Model()
    model.batch_size = 8
    model.class_num = 4
    model.class_labels = {str(i): i for i in range(4)}
    model.build(["C[8,3]", "BN", "A", "P[2]", "R"], (3, 16, 16),
                border_mode="half", weight_init=["he-forward"])
    numpy.random.seed(5)
    x = numpy.random.uniform(0, 1, (8, 3, 16, 16)).astype(numpy.float32)
    metas = [{"image_class": i % 4} for i in range(8)]
    trainer = Trainer(model, solver_mode="sgd", seed=7)
    cost, _ = trainer.train_step(x, metas, 0, 0, 0.1, [0.9, 0.999], 0.0)
    w = numpy.asarray(model.params[1]["weight"])

    assert abs(results[0][0] - cost) < 1e-5
    assert abs(results[0][1] - float(w.sum())) < 1e-4
