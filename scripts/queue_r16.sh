#!/bin/bash
# Round-5 chip queue #16: the last HLO-audit lever — PoolInv lowering A/B
# on the wide model (pool_inv broadcast was 4.1% of estimated cycles,
# reasoned-away but never measured; VERDICT r4 item 4's bar is
# measured-and-eliminated).  ~10 min.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r16.sh > /tmp/queue_r16.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r15
r15_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r15.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r15.log 2>/dev/null && break
    r15_alive || { echo "queue_r15 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r16.pid

step ab_poolinv_wide
timeout 1800 python -u scripts/ab_poolinv.py \
    > /tmp/ab_poolinv_wide.log 2>&1 || echo "FAILED ab_poolinv_wide"

step DONE
