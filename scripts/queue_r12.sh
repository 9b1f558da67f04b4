#!/bin/bash
# Round-5 chip queue #12: RoI-gather lowering A/B (HLO-audit lever 2).
#   Waits on queue_r11's DONE marker (pid files race — see queue_r8.sh),
#   then runs scripts/ab_gather.py on the wide v2 (big feature map, the
#   audit's subject) and the skip flagship.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r12.sh > /tmp/queue_r12.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r11
r11_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r11.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r11.log 2>/dev/null && break
    r11_alive || { echo "queue_r11 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r12.pid

step ab_gather_wide
timeout 1800 python -u scripts/ab_gather.py \
    > /tmp/ab_gather_wide.log 2>&1 || echo "FAILED ab_gather_wide"

step ab_gather_skip
timeout 1800 python -u scripts/ab_gather.py \
    --model models/denet34_skip_synth512.mdl.gz \
    > /tmp/ab_gather_skip.log 2>&1 || echo "FAILED ab_gather_skip"

step DONE
