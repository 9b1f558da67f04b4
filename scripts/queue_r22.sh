#!/bin/bash
# Round-5 chip queue #22 (final): matched-budget point for the reference's
# best published row (DeNet101-wide x768 v2 — /root/reference README.md:128
# trains its best model at 768 natively).
#   1. wide101_v2e: 96k steps @512, same protocol as wide34_v2e (trunk
#      warm-start from the 16k wide101_v1, --save-every 8k, stall watchdog;
#      bounded retries resume from the newest sidecar — PERF.md round-5
#      relay-wedge recovery protocol).  Budget series for the 101-wide:
#      16k 0.4468 / 28k 0.5070 / 48k 0.5756 / 96k -> this run.
#   2. x768 surgery + eval (x768_eval.py) on it.
#   3. 768-native fine-tune of the surgery model (12k @ lr 2e-3 — the
#      protocol that bought wide34 +0.108 COCO in 20 chip-minutes).
#   Champions committed as they land.  After DONE the chip stays QUIET for
#   the driver's round-end bench.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r22.sh > /tmp/queue_r22.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
echo $$ > /tmp/queue_r22.pid

step train_wide101_v2e_96k
OUT=$V/denet101_wide_v2e.mdl.gz
DONE_MARK=/tmp/train_wide101_v2e.done
rm -f "$DONE_MARK"
for attempt in 1 2 3; do
    if [ -f "$OUT.resume.npz" ]; then
        INIT="--resume"
    else
        INIT="--init-trunk $V/denet101_wide_v1.mdl.gz"
    fi
    timeout 10800 $T --family 101 --variant wide --v2 --dnc 'DNC[48,100]' \
        --steps 96000 --save-every 8000 --stall-timeout 900 $INIT \
        --out $OUT > /tmp/train_wide101_v2e_$attempt.log 2>&1 \
        && { echo "attempt $attempt finished"; touch "$DONE_MARK"; break; } \
        || echo "attempt $attempt exited nonzero (wedge/timeout) — retrying from newest checkpoint"
done

step commit_v2e_101
if [ -f "$OUT" ]; then
    git add -f "$OUT" && \
    git commit -m "preserve wide101_v2e 96k checkpoint (reset durability)" \
        > /tmp/commit_v2e_101.log 2>&1 || echo "FAILED commit_v2e_101"
fi

step x768_wide101_v2e
if [ -f "$DONE_MARK" ]; then
    timeout 3600 python -u scripts/x768_eval.py \
        --model $V/denet101_wide_v2e.mdl.gz \
        --out $V/denet101_wide_x768_v2e.mdl.gz \
        --tag denet101_wide_x768_v2e \
        > /tmp/x768_eval_101wide_v2e.log 2>&1 || echo "FAILED x768_wide101_v2e"
else
    echo "SKIP x768 — the 96k run never completed"
fi

step commit_x768_v2e_101
if [ -f $V/denet101_wide_x768_v2e.mdl.gz ]; then
    git add -f $V/denet101_wide_x768_v2e.mdl.gz && \
    git commit -m "preserve wide101 x768_v2e surgery checkpoint" \
        > /tmp/commit_x768_v2e_101.log 2>&1 || echo "FAILED commit_x768_v2e_101"
fi

step ft768_wide101_v2e
FOUT=$V/denet101_wide_x768_v2e_ft.mdl.gz
if [ -f $V/denet101_wide_x768_v2e.mdl.gz ]; then
    for attempt in 1 2 3 4; do
        if [ -f "$FOUT.resume.npz" ]; then
            INIT="--resume"
        else
            INIT="--init-model $V/denet101_wide_x768_v2e.mdl.gz"
        fi
        timeout 7200 $T --size 768 --steps 12000 --lr 0.002 \
            --save-every 2000 --stall-timeout 900 $INIT \
            --out $FOUT > /tmp/train_x768_101_v2e_ft_$attempt.log 2>&1 \
            && { echo "ft attempt $attempt finished"; break; } \
            || echo "ft attempt $attempt exited nonzero — retrying from newest checkpoint"
    done
fi

step commit_ft768_v2e_101
if grep -q "COCO mAP" /tmp/train_x768_101_v2e_ft_*.log 2>/dev/null; then
    git add -f "$FOUT" && \
    git commit -m "preserve wide101 x768_v2e 768-native fine-tune checkpoint" \
        > /tmp/commit_ft768_v2e_101.log 2>&1 || echo "FAILED commit_ft768_v2e_101"
else
    echo "NO EVAL LINE — not committing the ft"
fi

step DONE
