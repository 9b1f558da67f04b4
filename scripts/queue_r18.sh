#!/bin/bash
# Round-5 chip queue #18: extend the 768-native fine-tune.
#   The 12k ft (queue_r17) was the single highest-leverage training run of
#   the build (+0.108 COCO in 20 chip-minutes, PERF.md "768-native
#   fine-tune").  One more budget point: a FRESH 48k ft from the same
#   surgery checkpoint (clean protocol — the lr schedule holds until 70%
#   then drops, so extending a finished run would skip the high-lr phase).
#   Committed to git on landing.  Nothing else: after this the chip stays
#   QUIET for the driver's round-end bench (VERDICT r4 item 1).
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r18.sh > /tmp/queue_r18.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r17
r17_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r17.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r17.log 2>/dev/null && break
    r17_alive || { echo "queue_r17 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r18.pid

step ft768_48k_wide34_v2f
[ -f $V/denet34_wide_x768_v2f.mdl.gz ] && \
timeout 8000 $T --size 768 --steps 48000 --lr 0.002 --save-every 8000 \
    --init-model $V/denet34_wide_x768_v2f.mdl.gz \
    --out $V/denet34_wide_x768_v2f_ft48.mdl.gz \
    > /tmp/train_x768_v2f_ft48.log 2>&1 || echo "FAILED ft768_48k"

step commit_ft48
if [ -f $V/denet34_wide_x768_v2f_ft48.mdl.gz ]; then
    git add -f $V/denet34_wide_x768_v2f_ft48.mdl.gz && \
    git commit -m "preserve wide34 x768_v2f 48k 768-native fine-tune checkpoint" \
        > /tmp/commit_ft48.log 2>&1 || echo "FAILED commit_ft48"
fi

step DONE
