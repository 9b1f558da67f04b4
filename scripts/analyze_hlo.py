"""Optimized-HLO analysis of the fused detection pipeline (VERDICT item 4).

Compiles the full pipeline for the real TPU, then inspects the optimized
HLO text for layout/fusion pathologies: transpose/copy instructions with
large shapes (layout-assignment misses), convolution custom-call count,
and the largest non-fused ops.  Pure compile + local text analysis — no
timed device execution.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/analyze_hlo.py
"""
import os
import re
import sys
from collections import Counter

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

fn = model.build_full_detect_fn(detect_layer, 0.01, 0.5, corner_k=256,
                                top_m=128, top_n=100)
rng = numpy.random.RandomState(3)
x = numpy.zeros((batch, 3, size, size), numpy.uint8)

lowered = jax.jit(fn).lower(model.params, model.state, x)
compiled = lowered.compile()
txt = compiled.as_text()
print("HLO text: %.1f MB, %d lines" % (len(txt) / 1e6, txt.count("\n")))

SHAPE_RE = re.compile(r"(bf16|f32|f16|s32|u32|u8|pred)\[([\d,]*)\]")


def shape_bytes(m):
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * {"bf16": 2, "f16": 2, "f32": 4, "s32": 4, "u32": 4,
                "u8": 1, "pred": 1}[dt]


op_counts = Counter()
transpose_bytes = []
copy_bytes = []
conv_lines = []
fusion_count = 0
for line in txt.splitlines():
    ls = line.strip()
    m = re.match(r"(?:ROOT )?%?[\w.\-]+ = (\w+)\[?", ls)
    if " = " not in ls:
        continue
    rhs = ls.split(" = ", 1)[1]
    sm = SHAPE_RE.match(rhs)
    opm = re.search(r"\]?[\s}]*(\w[\w\-]*)\(", rhs)
    op = opm.group(1) if opm else "?"
    op_counts[op] += 1
    if op == "fusion":
        fusion_count += 1
    if op == "transpose" and sm:
        transpose_bytes.append((shape_bytes(sm), ls[:140]))
    if op == "copy" and sm:
        copy_bytes.append((shape_bytes(sm), ls[:140]))
    if "convolution" in rhs[:400] and ("custom-call" in rhs or op == "convolution"):
        conv_lines.append(ls[:150])

print("\ntop ops:", op_counts.most_common(15))
print("\nconvolutions: %d" % len(conv_lines))
print("fusions: %d" % fusion_count)

transpose_bytes.sort(reverse=True)
copy_bytes.sort(reverse=True)
print("\nlargest transposes (layout changes):")
for b, l in transpose_bytes[:12]:
    print("  %8.2f MB  %s" % (b / 1e6, l))
print("\nlargest copies:")
for b, l in copy_bytes[:12]:
    print("  %8.2f MB  %s" % (b / 1e6, l))

total_t = sum(b for b, _ in transpose_bytes) + sum(b for b, _ in copy_bytes)
print("\ntotal transpose+copy bytes touched: %.1f MB/step" % (total_t / 1e6))

# rough bandwidth bound: HBM ~ 820 GB/s on v5e
print("=> lower-bound cost at 820GB/s: %.3f ms" % (2 * total_t / 820e9 * 1e3))
print("DONE")
