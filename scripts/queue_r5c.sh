#!/bin/bash
# Round-4 chip queue #3: wide-row batch-scaling probe.  The round-4 profile
# shows the wide serving floor is cap-independent fixed cost (trunk 6.45ms +
# corner search 2.2 + detect 4.5 + glue at b8); if that cost is XLA
# scheduling-bound rather than FLOPs-bound, larger batches amortize it —
# the cheapest remaining lever toward the 8x wide34_v2 goal.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r5c.sh > /tmp/queue_r5c.log 2>&1 &
set -u
cd /root/repo
V=models/variants

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# Wait on the r5b DONE marker.  Do NOT trust pid files for liveness: a
# queue that is itself still WAITING on its predecessor has not written
# its pid file yet (that bug made the first r5c launch start benching
# concurrently with r5's training).  Liveness = any queue/training/eval
# process visible in /proc, 3 consecutive dead polls required.
step wait_r5b
misses=0
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r5b.log 2>/dev/null && break
    alive=0
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -qE \
            'scripts/(train_flagship_synth|x768_eval|occlusion_study|profile_wide|bench_variants|queue_r5b?\.sh)' \
            && { alive=1; break; }
    done
    if [ "$alive" = 1 ]; then misses=0; else
        misses=$((misses + 1))
        [ $misses -ge 3 ] && {
            echo "predecessor queues dead without DONE marker; proceeding"
            break
        }
    fi
    sleep 120
done

echo $$ > /tmp/queue_r5c.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r5c.log \
    > /tmp/log_watcher_r5c.log 2>&1 &

step wide_batch16
timeout 3600 python -u scripts/bench_variants.py --models-dir $V \
    --only denet34_wide_v2,denet101_wide_v2,denet34_wide_v1 --batch 16 \
    --out /tmp/wide_batch.jsonl \
    > /tmp/bench_wide_b16.log 2>&1 || echo "FAILED wide_batch16"

step wide_batch32
timeout 3600 python -u scripts/bench_variants.py --models-dir $V \
    --only denet34_wide_v2,denet101_wide_v2,denet34_wide_v1 --batch 32 \
    --out /tmp/wide_batch.jsonl \
    > /tmp/bench_wide_b32.log 2>&1 || echo "FAILED wide_batch32"

step DONE
