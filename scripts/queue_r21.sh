#!/bin/bash
# Round-5 chip queue #21: RESUME the wedged queue_r20 768-native fine-tune
#   of denet101_wide_x768_v2c.  The r20 trainer stalled mid-steady-state at
#   step ~5400 (relay wedge class, PERF.md round-3 "stalled mid-run") after
#   checkpointing step 4000 via --save-every; this resumes bit-identically
#   from the sidecar.  Two attempts (a resumed process re-attaches to the
#   relay fresh); each further attempt restarts from the newest checkpoint.
#   Commits the checkpoint on landing.  After DONE the chip stays QUIET for
#   the driver's round-end bench.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r21.sh > /tmp/queue_r21.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
echo $$ > /tmp/queue_r21.pid

step resume_ft768_wide101
for attempt in 1 2 3; do
    timeout 3600 $T --size 768 --steps 12000 --lr 0.002 --save-every 2000 \
        --resume \
        --out $V/denet101_wide_x768_v2c_ft.mdl.gz \
        > /tmp/train_x768_101_ft_r21_$attempt.log 2>&1 \
        && { echo "attempt $attempt finished"; break; } \
        || echo "attempt $attempt exited nonzero (timeout/wedge?) — retrying from newest checkpoint"
done

step commit_ft101
# only commit if the final eval ran (the log carries the COCO line)
if grep -q "COCO mAP" /tmp/train_x768_101_ft_r21_*.log 2>/dev/null; then
    git add -f $V/denet101_wide_x768_v2c_ft.mdl.gz && \
    git commit -m "preserve wide101 x768_v2c 768-native fine-tune checkpoint" \
        > /tmp/commit_ft101.log 2>&1 || echo "FAILED commit_ft101"
else
    echo "NO EVAL LINE — not committing"
fi

step DONE
