#!/bin/bash
# Round-5 chip queue #23 (chained after r22): completes the within-family
# 768-native fine-tune curve, then validates the headline cold.
#   1. wait for queue_r22's DONE marker (liveness fallback on its pid —
#      NEVER wait on a later queue's pid file, it races; PERF.md r8 lesson).
#   2. ft768 on wide34_v2e's surgery checkpoint (96k base) — pairs with the
#      v2f (192k base) ft to show the grid-adaptation lift as a function of
#      base budget within one family.  ~17 min of chip at 93.9 img/s.
#   3. two cold-process bench.py runs (the 843-852 img/s band check).
#   After DONE the chip stays QUIET for the driver's round-end bench.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r23.sh > /tmp/queue_r23.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
echo $$ > /tmp/queue_r23.pid

step wait_r22
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r22.log 2>/dev/null && break
    pid=$(cat /tmp/queue_r22.pid 2>/dev/null)
    if [ -n "${pid:-}" ] && ! kill -0 "$pid" 2>/dev/null; then
        echo "r22 queue process dead without DONE — proceeding anyway"
        break
    fi
    sleep 60
done

step ft768_wide34_v2e
FOUT=$V/denet34_wide_x768_v2e_ft.mdl.gz
if [ -f $V/denet34_wide_x768_v2e.mdl.gz ]; then
    for attempt in 1 2 3; do
        if [ -f "$FOUT.resume.npz" ]; then
            INIT="--resume"
        else
            INIT="--init-model $V/denet34_wide_x768_v2e.mdl.gz"
        fi
        timeout 3600 $T --size 768 --steps 12000 --lr 0.002 \
            --save-every 4000 --stall-timeout 900 $INIT \
            --out $FOUT > /tmp/train_x768_v2e_ft_$attempt.log 2>&1 \
            && { echo "ft attempt $attempt finished"; break; } \
            || echo "ft attempt $attempt exited nonzero — retrying from newest checkpoint"
    done
fi

step commit_ft768_v2e
if grep -q "COCO mAP" /tmp/train_x768_v2e_ft_*.log 2>/dev/null; then
    git add -f "$FOUT" && \
    git commit -m "preserve wide34 x768_v2e 768-native fine-tune checkpoint" \
        > /tmp/commit_ft768_v2e.log 2>&1 || echo "FAILED commit_ft768_v2e"
else
    echo "NO EVAL LINE — not committing the ft"
fi

step bench_cold_1
timeout 1800 python -u bench.py > /tmp/r23_bench_1.log 2>&1 \
    || echo "FAILED bench_cold_1"
step bench_cold_2
timeout 1800 python -u bench.py > /tmp/r23_bench_2.log 2>&1 \
    || echo "FAILED bench_cold_2"

step DONE
