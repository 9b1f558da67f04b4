"""Serving-batch scaling sweep of the fused detection pipeline.

Same protocol as bench.py (trained checkpoint, training-distribution
uint8 inputs, single stacked detections download per window) at several
batch sizes in ONE process — one compile set, one link transition.
VERDICT round-1 item 4: push serving batch past 32.
"""
import json
import os
import sys
import time

import numpy

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

import denet_tpu.core.model as model_mod
import denet_tpu.utils.logging as logging
from denet_tpu.core.model import _keepalive
from denet_tpu.data.synthetic import make_uint8_batch
from denet_tpu.ops.nms_device import dets_to_lists

logging.init(level="warning")
os.environ.setdefault("DENET_TPU_S2D_STEM", "1")

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "models", "denet34_skip_synth512.mdl.gz")
SIZE = 512
BATCHES = [int(b) for b in
           os.environ.get("DENET_SWEEP_BATCHES", "8,16,32,64").split(",")]
BASELINE_HZ = 82.0

rng = numpy.random.RandomState(3)
results = {}
for batch in BATCHES:
    model = model_mod.load_from_file(CKPT, batch_size=batch)
    model.compute_dtype = jnp.bfloat16
    detect_layer = model.layers[-1]
    model.ensure_on_device()

    n_staged = max(2, 40 // (batch // 8))
    iters = max(10, 320 // batch)      # ~2560 images per window
    staged = [jnp.asarray(make_uint8_batch(rng, batch, SIZE,
                                           model.class_num)[0])
              for _ in range(min(n_staged, 5))]

    fn = _keepalive(model.build_full_detect_fn(
        detect_layer, 0.01, 0.5, corner_k=256, top_m=128, top_n=100))
    params = model.inference_params()   # pre-cast bf16 conv weights

    # one-transfer drain: counts come from the score sentinel (see bench.py)
    def drain(dets_list):
        return jnp.stack(dets_list)

    drain_fn = _keepalive(jax.jit(drain))

    # warm: compile fn AND the full iters-length drain stack signature
    rs = [fn(params, model.state, staged[i % len(staged)])
          for i in range(2)]
    d = drain_fn([rs[i % 2][0] for i in range(iters)])
    numpy.asarray(d[0, 0, 0])   # link transition on first sweep entry only

    t0 = time.time()
    rs = [fn(params, model.state, staged[i % len(staged)])
          for i in range(iters)]
    dets = numpy.asarray(drain_fn([r[0] for r in rs]))
    n = 0
    for i in range(iters):
        n += len(dets_to_lists(dets[i]))
    dt = time.time() - t0
    assert n == batch * iters
    hz = batch * iters / dt
    results[batch] = hz
    print(json.dumps({"metric": "denet34_skip_detect_b%d" % batch,
                      "value": round(hz, 2), "unit": "images/sec",
                      "vs_baseline": round(hz / BASELINE_HZ, 3)}), flush=True)

print("DONE", results)
