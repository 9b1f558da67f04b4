"""Profiling / tracing helpers — the TPU equivalents of the reference's
Theano profiler wrapper and compiled-graph dumps (denet/common/theano_util.py
:8-23, model_cnn.py:403-405).

* ``trace(logdir)``       — context manager around jax.profiler traces
  (viewable in TensorBoard / xprof).
* ``profile(fn, n, *a)``  — time n steady-state calls with block_until_ready.
* ``export_graph(fname, fn, *args)`` — dump the lowered StableHLO (and the
  compiled HLO when available) of a jitted function, the analogue of the
  reference's graph.txt debugprint dumps.
* ``debug_nans(enable)``  — jax NaN guard, the NanGuardMode equivalent.
"""
import contextlib
import time

import jax

import denet_tpu.utils.logging as logging


@contextlib.contextmanager
def trace(logdir="/tmp/denet_tpu_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
        logging.info("Wrote profiler trace to %s" % logdir)


def profile(fn, it_num, *args, **kwargs):
    """Average steady-state wall time per call (sec); blocks on results."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(it_num):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / it_num
    logging.info("Profiled %s: %.3f ms/call" % (
        getattr(fn, "__name__", fn), 1000 * dt))
    return dt


def export_graph(fname, fn, *args, **kwargs):
    """Write the lowered (and, if compilable, optimized) HLO of ``fn``."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    with open(fname, "w") as f:
        f.write(lowered.as_text())
    try:
        with open(fname + ".opt", "w") as f:
            f.write(lowered.compile().as_text())
    except Exception as e:  # optimized text unavailable on some backends
        logging.verbose("optimized HLO dump unavailable:", e)
    logging.verbose("Saved function graph: " + fname)


def debug_nans(enable=True):
    """Equivalent of the reference's NanGuardMode debug_train flag."""
    jax.config.update("jax_debug_nans", enable)
