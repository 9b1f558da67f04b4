#!/bin/bash
# Round-5 chip queue #15: extended-budget 96k v2 training on the wide34
# path (the 48k series showed no saturation — budget is the occlusion
# lever, and at 48k budget washes out depth so the cheaper 34 trunk is the
# best new-best candidate; PERF.md round 5), then x768 surgery on it.
# The v1 trunk was wiped by the reset — regenerate it first from the
# committed flagship (seeded pipeline, bit-identical to the trunk v2c
# used).  Mid-run checkpoints every 8k steps; champions committed to git
# IMMEDIATELY (reset durability, VERDICT r4 items 2+5).
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r15.sh > /tmp/queue_r15.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
FLAG=models/denet34_skip_synth512.mdl.gz
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r14
r14_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r14.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r14.log 2>/dev/null && break
    r14_alive || { echo "queue_r14 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r15.pid

step wide34_v1_regen
[ -f $V/denet34_wide_v1.mdl.gz ] || \
timeout 3600 $T --family 34 --variant wide --dnc 'DNC[48,100]' \
    --steps 16000 --init-prefix $FLAG \
    --out $V/denet34_wide_v1.mdl.gz \
    > /tmp/train_wide34_v1.log 2>&1 || echo "FAILED wide34_v1_regen"

step train_wide34_v2e_96k
[ -f $V/denet34_wide_v1.mdl.gz ] && \
timeout 9000 $T --family 34 --variant wide --v2 --dnc 'DNC[48,100]' \
    --steps 96000 --save-every 8000 \
    --init-trunk $V/denet34_wide_v1.mdl.gz \
    --out $V/denet34_wide_v2e.mdl.gz \
    > /tmp/train_wide34_v2e.log 2>&1 || echo "FAILED train_wide34_v2e"

step commit_v2e
if [ -f $V/denet34_wide_v2e.mdl.gz ]; then
    git add -f $V/denet34_wide_v2e.mdl.gz && \
    git commit -m "preserve wide34_v2e 96k checkpoint (reset durability)" \
        > /tmp/commit_v2e.log 2>&1 || echo "FAILED commit_v2e"
fi

step x768_wide34_v2e
[ -f $V/denet34_wide_v2e.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py \
    --model $V/denet34_wide_v2e.mdl.gz \
    --out $V/denet34_wide_x768_v2e.mdl.gz \
    --tag denet34_wide_x768_v2e \
    > /tmp/x768_eval_34wide_v2e.log 2>&1 || echo "FAILED x768_wide34_v2e"

step commit_x768_v2e
if [ -f $V/denet34_wide_x768_v2e.mdl.gz ]; then
    git add -f $V/denet34_wide_x768_v2e.mdl.gz && \
    git commit -m "preserve wide34 x768_v2e surgery checkpoint" \
        > /tmp/commit_x768_v2e.log 2>&1 || echo "FAILED commit_x768_v2e"
fi

step DONE
