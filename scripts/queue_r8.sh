#!/bin/bash
# Round-4 chip queue #6: extended-budget v2 training.
#   The depth-budget series (48k skip test, jointfit36k) shows longer
#   schedules keep paying on the hard distribution; the current best
#   checkpoint (wide101_v2b, COCO 0.5070) used only a 16k v2 budget.
#   1. wide101_v2c: 48k v2 steps from the SAME v1b trunk (protocol
#      identical to v2b except 3x budget)
#   2. x768 surgery + eval on v2c (the reference's hardest config)
#   3. wide34_v2c: 48k from the wide34_v1 trunk (keeps the family table
#      budget-matched)
#   Harvest + canonical-name hardlinks + commits happen session-side after
#   comparing evals (v2b stays flagship unless v2c beats it).
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r8.sh > /tmp/queue_r8.log 2>&1 &
set -u
cd /root/repo
V=models/variants
T="timeout 10800 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r7
# r7 writes its pid file only after ITS OWN wait on r6 completes, so a pid
# check alone races (the first r8 launch started training concurrently with
# r6 — killed within a minute).  Wait for r7's DONE marker, with a liveness
# fallback: if no queue_r7.sh process exists AND the marker is absent, r7
# crashed — proceed rather than hang forever.
r7_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r7.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r7.log 2>/dev/null && break
    r7_alive || { echo "queue_r7 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r8.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r8.log \
    > /tmp/log_watcher_r8.log 2>&1 &

step wide101_v2c_48k
[ -f $V/denet101_wide_v2c.mdl.gz ] || { [ -f $V/denet101_wide_v1b.mdl.gz ] && \
$T --family 101 --variant wide --v2 --dnc 'DNC[48,100]' --steps 48000 \
   --init-trunk $V/denet101_wide_v1b.mdl.gz \
   --out $V/denet101_wide_v2c.mdl.gz \
   > /tmp/train_wide101_v2c.log 2>&1 ; } || echo "FAILED wide101_v2c"

step x768_v2c
[ -f $V/denet101_wide_v2c.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py \
    --model $V/denet101_wide_v2c.mdl.gz \
    --out $V/denet101_wide_x768_v2c.mdl.gz \
    --tag denet101_wide_x768_v2c --baseline-hz 11 \
    > /tmp/x768_eval_101wide_v2c.log 2>&1 || echo "FAILED x768_v2c"

step wide34_v2c_48k
[ -f $V/denet34_wide_v2c.mdl.gz ] || { [ -f $V/denet34_wide_v1.mdl.gz ] && \
$T --family 34 --variant wide --v2 --dnc 'DNC[48,100]' --steps 48000 \
   --init-trunk $V/denet34_wide_v1.mdl.gz \
   --out $V/denet34_wide_v2c.mdl.gz \
   > /tmp/train_wide34_v2c.log 2>&1 ; } || echo "FAILED wide34_v2c"

step DONE
