#!/bin/bash
# Round-4 chip queue #4:
#   1. full trained 7-row sweep under the opt cap policy (the shipped
#      BENCH_variants.jsonl regeneration — v2 rows serve the expected-cost
#      cap and escalate rare crowded batches; see scripts/ab_cap_policy.py
#      for the controlled A/B that motivated making it the default)
#   2. the 96k depth-crossing pair: the 48k test halved the skip inversion
#      (-0.0257 @ 28k -> -0.0109 @ 48k, PERF.md depth-budget addendum) —
#      96k at the same clean transplant protocol tests whether skip101
#      actually CROSSES skip34, completing the deeper-is-better evidence.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r6.sh > /tmp/queue_r6.log 2>&1 &
set -u
cd /root/repo
V=models/variants
T="timeout 10800 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# wait for the cap-policy A/B (pid file) to finish
step wait_ab
while true; do
    pid=$(cat /tmp/ab_cap.pid 2>/dev/null)
    [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null || break
    sleep 60
done

echo $$ > /tmp/queue_r6.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r6.log \
    > /tmp/log_watcher_r6.log 2>&1 &

# 1. full trained sweep, opt cap policy (bench_variants default)
step sweep_opt
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    --out /tmp/variant_rates_r6.jsonl \
    > /tmp/bench_variants_r6.log 2>&1 || echo "FAILED sweep_opt"

# 2. 96k depth-crossing pair (same transplant protocol as the 28k/48k runs)
step skip101_v1d_96k
[ -f $V/denet101_skip_v1d.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 101 --variant skip --steps 96000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet101_skip_v1d.mdl.gz \
   > /tmp/train_skip101_v1d.log 2>&1 ; } || echo "FAILED skip101_v1d"

step skip34_ctl96
[ -f $V/denet34_skip_ctl96.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 34 --variant skip --steps 96000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet34_skip_ctl96.mdl.gz \
   > /tmp/train_skip34_ctl96.log 2>&1 ; } || echo "FAILED skip34_ctl96"

step DONE
