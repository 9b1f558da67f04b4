#!/bin/bash
# Round-4 chip queue #5:
#   1. wait for queue_r6 (96k depth-crossing pair) to finish
#   2. full trained 7-row sweep under the 256-GRID opt cap policy
#      (auto_cap_opt now considers lane-aligned multiples of 256, not just
#      powers of two: wide34_v2's observed max 2283 caps at 2304 instead of
#      4096 — a ~3x smaller quadratic clustering term; escalation guards
#      keep every cap bitwise lossless).  Regenerates the shipped
#      BENCH_variants.jsonl numbers.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r7.sh > /tmp/queue_r7.log 2>&1 &
set -u
cd /root/repo
V=models/variants

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r6
while true; do
    pid=$(cat /tmp/queue_r6.pid 2>/dev/null)
    [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || break
    sleep 60
done

echo $$ > /tmp/queue_r7.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r7.log \
    > /tmp/log_watcher_r7.log 2>&1 &

step sweep_grid256
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    --out /tmp/variant_rates_r7.jsonl \
    > /tmp/bench_variants_r7.log 2>&1 || echo "FAILED sweep_grid256"

step DONE
