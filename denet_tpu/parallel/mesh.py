"""Device-mesh data parallelism.

The reference's entire multi-GPU/multi-node machinery — one worker process
per GPU with shared-memory parameter averaging, plus a TCP/MPI parameter
server (denet/multi/worker.py, shared.py, update_server.py, update_client.py)
— collapses on TPU into ONE jit-compiled train step with GSPMD shardings:
the batch is sharded over the mesh's ``data`` axis, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI automatically
(mean-over-batch loss => psum in the backward pass).  Multi-host runs join
the same mesh via ``jax.distributed.initialize`` (DCN between hosts).

Synchronous parameter averaging of identical-initial-state workers with
averaged updates is mathematically identical to gradient averaging for
SGD-family solvers, so parity with the reference's sync mode is exact; the
reference's async parameter-server mode was an optimization for slow
interconnects with no TPU equivalent needed (SURVEY.md §2.5).
"""
import numpy

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import denet_tpu.utils.logging as logging

DATA_AXIS = "data"


def make_mesh(n_devices=None, devices=None):
    """1-D data-parallel mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(numpy.array(devices), (DATA_AXIS,))


def init_distributed(coordinator=None, num_processes=None, process_id=None):
    """Multi-host initialization (replaces the reference's UpdateServer /
    UpdateClient TCP star).  No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    logging.info("jax.distributed initialized: process %i/%i" % (
        process_id, num_processes))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over the data axis; works for any rank
    including flat batch-major target arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_args(mesh, tree, batch_leaves=False):
    """Device-put a pytree: replicated, or batch-sharded on leading axis.

    Multi-host: batch-sharded leaves are assembled from each process's local
    slice (every process passes the part of the global batch its local subset
    loader produced — the per-host data assignment that replaces the
    reference UpdateClient's subset scheduling, update_client.py:69-95)."""
    if batch_leaves and jax.process_count() > 1:
        sharding = batch_sharding(mesh)
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            tree)
    sharding = batch_sharding(mesh) if batch_leaves else replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
