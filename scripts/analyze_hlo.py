"""Optimized-HLO audit of the fused detection pipeline (VERDICT r1 item 4).

Compiles the full pipeline for the TPU, then ranks instructions by the
backend's own ``estimated_cycles`` (present in every fusion/copy backend
config of the scheduled module) — aggregated by op type and by source
line.  This is what located the round-2 wins: the S2D stem's bf16 input
transpose copy (now done on uint8 — half the bytes) and the per-step
f32->bf16 weight converts (now pre-cast once via Model.inference_params).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/analyze_hlo.py
"""
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy

import denet_tpu.utils.logging as logging
from __graft_entry__ import _build_detect_model
from bench import perturb_heads_host

logging.init(level="warning")

batch, size = 8, 512
model = _build_detect_model(batch, size, class_num=80, variant="skip")
model.compute_dtype = jnp.bfloat16
detect_layer = model.layers[-1]
perturb_heads_host(model)
model.ensure_on_device()

fn = model.build_full_detect_fn(detect_layer, 0.01, 0.5, corner_k=256,
                                top_m=128, top_n=100)
x = numpy.zeros((batch, 3, size, size), numpy.uint8)
params = model.inference_params()
compiled = jax.jit(fn).lower(params, model.state, x).compile()
txt = compiled.as_text()

ca = compiled.cost_analysis()
ca = ca[0] if isinstance(ca, list) else ca
if ca:
    print("flops/step: %.1f G   bytes accessed/step: %.2f GB" % (
        ca.get("flops", 0) / 1e9, ca.get("bytes accessed", 0) / 1e9))

tot = 0
by_src = defaultdict(int)
by_op = defaultdict(int)
rows = []
for ls in txt.splitlines():
    m = re.search(r'"estimated_cycles":"(\d+)"', ls)
    if not m:
        continue
    cyc = int(m.group(1))
    tot += cyc
    sm = re.search(r'source_file="([^"]+)" source_line=(\d+)', ls)
    src = ("%s:%s" % (sm.group(1).split("/")[-1], sm.group(2))) if sm else "?"
    om = re.search(r'= \S+ (\w[\w\-\.]*)\(', ls)
    op = om.group(1).split(".")[0] if om else "?"
    by_src[src] += cyc
    by_op[op] += cyc
    rows.append((cyc, op, src, ls.strip()[:110]))

print("total estimated cycles: %d (~%.2f ms at 940 MHz; scheduler estimate,"
      " not wall clock — use for RANKING)" % (tot, tot / 940e6 * 1e3))
print("\nby op type:")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
    print("  %-22s %10d  (%4.1f%%)" % (k, v, 100 * v / tot))
print("\nby source line (top 20):")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:20]:
    print("  %-36s %10d  (%4.1f%%)" % (k, v, 100 * v / tot))
rows.sort(reverse=True)
print("\ntop 15 single instructions:")
for cyc, op, src, l in rows[:15]:
    print("  %9d  %-12s %-30s %s" % (cyc, op, src, l[:95]))
print("DONE")
