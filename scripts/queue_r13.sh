#!/bin/bash
# Round-5 chip queue #13: train-step HLO audit on the real backend.
#   Waits on queue_r12's DONE marker, then audits the production train
#   step (device targets) with and without SPLIT remat — the lever list
#   for training throughput (serving got its list in round 5's detect
#   audit; training never had one).
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r13.sh > /tmp/queue_r13.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r12
r12_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r12.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r12.log 2>/dev/null && break
    r12_alive || { echo "queue_r12 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r13.pid

step hlo_train_remat
timeout 1800 python -u scripts/analyze_hlo.py --train --top 20 \
    > /tmp/r13_hlo_train.log 2>&1 || echo "FAILED hlo_train_remat"

step hlo_train_noremat
timeout 1800 python -u scripts/analyze_hlo.py --train --no-remat --top 20 \
    > /tmp/r13_hlo_train_noremat.log 2>&1 || echo "FAILED hlo_train_noremat"

step DONE
