#!/bin/bash
# Round-5 chip queue #24: SAFETY NET behind r22/r23.  The 10:23 relay wedge
# (second of the day; this one with drained socket queues — upstream stopped
# responding rather than pipe backpressure) may burn r22's bounded retries
# before the tunnel recovers.  This queue waits for r23's DONE, then
# completes whatever the wedge window killed, idempotently:
#   1. finish the wide101_v2e 96k run (resume from the newest sidecar,
#      8 spaced attempts — sleeps between attempts ride out a long outage).
#   2. x768 surgery + eval if missing.
#   3. 768-native ft if missing.
#   4. ft768 on wide34_x768_v2e if r23's arm never produced an eval.
#   Commits as champions land.  If everything already landed, every arm
#   no-ops and the chip parks immediately.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r24.sh > /tmp/queue_r24.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }
echo $$ > /tmp/queue_r24.pid

step wait_r23
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r23.log 2>/dev/null && break
    pid=$(cat /tmp/queue_r23.pid 2>/dev/null)
    if [ -n "${pid:-}" ] && ! kill -0 "$pid" 2>/dev/null; then
        echo "r23 queue process dead without DONE — proceeding anyway"
        break
    fi
    sleep 60
done

OUT=$V/denet101_wide_v2e.mdl.gz
DONE_MARK=/tmp/train_wide101_v2e.done

step finish_wide101_v2e_96k
if [ ! -f "$DONE_MARK" ]; then
    for attempt in 4 5 6 7 8 9 10 11; do
        if [ -f "$OUT.resume.npz" ]; then
            INIT="--resume"
        else
            INIT="--init-trunk $V/denet101_wide_v1.mdl.gz"
        fi
        timeout 10800 $T --family 101 --variant wide --v2 --dnc 'DNC[48,100]' \
            --steps 96000 --save-every 8000 --stall-timeout 900 $INIT \
            --out $OUT > /tmp/train_wide101_v2e_$attempt.log 2>&1 \
            && { echo "attempt $attempt finished"; touch "$DONE_MARK"; break; } \
            || { echo "attempt $attempt exited nonzero — sleeping before retry"; sleep 300; }
    done
    if [ -f "$DONE_MARK" ]; then
        git add -f "$OUT" && \
        git commit -m "preserve wide101_v2e 96k checkpoint (reset durability)" \
            > /tmp/commit_v2e_101b.log 2>&1 || echo "FAILED commit (r24)"
    fi
else
    echo "96k already done"
fi

step x768_wide101_v2e
if [ -f "$DONE_MARK" ] && [ ! -f $V/denet101_wide_x768_v2e.mdl.gz ]; then
    timeout 3600 python -u scripts/x768_eval.py \
        --model $V/denet101_wide_v2e.mdl.gz \
        --out $V/denet101_wide_x768_v2e.mdl.gz \
        --tag denet101_wide_x768_v2e \
        > /tmp/x768_eval_101wide_v2e.log 2>&1 || echo "FAILED x768 (r24)"
    if [ -f $V/denet101_wide_x768_v2e.mdl.gz ]; then
        git add -f $V/denet101_wide_x768_v2e.mdl.gz && \
        git commit -m "preserve wide101 x768_v2e surgery checkpoint" \
            > /tmp/commit_x768_v2e_101b.log 2>&1 || echo "FAILED commit (r24)"
    fi
else
    echo "surgery present or 96k missing — skip"
fi

step ft768_wide101_v2e
FOUT=$V/denet101_wide_x768_v2e_ft.mdl.gz
if [ -f $V/denet101_wide_x768_v2e.mdl.gz ] \
        && ! grep -q "COCO mAP" /tmp/train_x768_101_v2e_ft_*.log 2>/dev/null; then
    for attempt in 5 6 7 8; do
        if [ -f "$FOUT.resume.npz" ]; then
            INIT="--resume"
        else
            INIT="--init-model $V/denet101_wide_x768_v2e.mdl.gz"
        fi
        timeout 7200 $T --size 768 --steps 12000 --lr 0.002 \
            --save-every 2000 --stall-timeout 900 $INIT \
            --out $FOUT > /tmp/train_x768_101_v2e_ft_$attempt.log 2>&1 \
            && { echo "ft attempt $attempt finished"; break; } \
            || { echo "ft attempt $attempt exited nonzero — sleeping before retry"; sleep 300; }
    done
fi
if grep -q "COCO mAP" /tmp/train_x768_101_v2e_ft_*.log 2>/dev/null \
        && ! git ls-files --error-unmatch "$FOUT" >/dev/null 2>&1; then
    git add -f "$FOUT" && \
    git commit -m "preserve wide101 x768_v2e 768-native fine-tune checkpoint" \
        > /tmp/commit_ft768_v2e_101b.log 2>&1 || echo "FAILED commit (r24)"
fi

step ft768_wide34_v2e_catchup
FOUT34=$V/denet34_wide_x768_v2e_ft.mdl.gz
if [ -f $V/denet34_wide_x768_v2e.mdl.gz ] \
        && ! grep -q "COCO mAP" /tmp/train_x768_v2e_ft_*.log 2>/dev/null; then
    for attempt in 4 5 6; do
        if [ -f "$FOUT34.resume.npz" ]; then
            INIT="--resume"
        else
            INIT="--init-model $V/denet34_wide_x768_v2e.mdl.gz"
        fi
        timeout 3600 $T --size 768 --steps 12000 --lr 0.002 \
            --save-every 4000 --stall-timeout 900 $INIT \
            --out $FOUT34 > /tmp/train_x768_v2e_ft_$attempt.log 2>&1 \
            && { echo "ft34 attempt $attempt finished"; break; } \
            || { echo "ft34 attempt $attempt exited nonzero — sleeping before retry"; sleep 300; }
    done
fi
if grep -q "COCO mAP" /tmp/train_x768_v2e_ft_*.log 2>/dev/null \
        && ! git ls-files --error-unmatch "$FOUT34" >/dev/null 2>&1; then
    git add -f "$FOUT34" && \
    git commit -m "preserve wide34 x768_v2e 768-native fine-tune checkpoint" \
        > /tmp/commit_ft768_v2e_34b.log 2>&1 || echo "FAILED commit (r24)"
fi

step DONE
