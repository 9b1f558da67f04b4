#!/bin/bash
# Round-5 chip queue #11: measure the corner-diff DCE in the shipped
# configurations.
#   1. full trained 7-row sweep (calibrated opt caps) — regenerates the
#      shipped BENCH_variants.jsonl numbers with the logsumexp tree DCE'd
#      (expected: wide rows +10-16%, skip rows ~0-6%)
#   2. profile_wide refresh on wide34_v2c — new floor decomposition
#   3. clean bench.py headline (settle window + median-of-3)
# Every entry takes chip_lease itself; blocks run serially.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r11.sh > /tmp/queue_r11.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants

echo $$ > /tmp/queue_r11.pid
step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step sweep_dce
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    --out /tmp/variant_rates_r11.jsonl \
    > /tmp/bench_variants_r11.log 2>&1 || echo "FAILED sweep_dce"

step profile_wide_dce
timeout 1800 python -u scripts/profile_wide.py \
    --model $V/denet34_wide_v2c.mdl.gz \
    > /tmp/r11_profile_wide.log 2>&1 || echo "FAILED profile_wide_dce"

step headline_dce
timeout 1800 python -u bench.py > /tmp/r11_bench_headline.log 2>&1 \
    || echo "FAILED headline_dce"

step DONE
