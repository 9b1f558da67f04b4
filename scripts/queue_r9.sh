#!/bin/bash
# Round-4 chip queue #7: retry skip101_v1d 96k.
#   The original r6 run wedged at step ~74k: a second trainer (the r8
#   wait-race bug) briefly attached to the axon relay and its kill left
#   r6's session blocked on a dead remote call forever (fresh processes
#   worked fine).  The checkpoint only saves at the end, so retrain.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r9.sh > /tmp/queue_r9.log 2>&1 &
set -u
cd /root/repo
V=models/variants
T="timeout 10800 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r8
r8_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r8.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r8.log 2>/dev/null && break
    r8_alive || { echo "queue_r8 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r9.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r9.log \
    > /tmp/log_watcher_r9.log 2>&1 &

step skip101_v1d_96k_retry
[ -f $V/denet101_skip_v1d.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 101 --variant skip --steps 96000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet101_skip_v1d.mdl.gz \
   > /tmp/train_skip101_v1d.log 2>&1 ; } || echo "FAILED skip101_v1d"

step DONE
