#!/bin/bash
# Round-5 chip queue #14: validate the settle-until-steady headline bench
# (two back-to-back bench.py runs — the driver's BENCH_r05 protocol), after
# queue_r13's train audits.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r14.sh > /tmp/queue_r14.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r13
r13_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r13.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "DONE" /tmp/queue_r13.log 2>/dev/null && break
    r13_alive || { echo "queue_r13 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r14.pid

step bench_steady_1
timeout 1800 python -u bench.py > /tmp/r14_bench_1.log 2>&1 \
    || echo "FAILED bench_steady_1"

step bench_steady_2
timeout 1800 python -u bench.py > /tmp/r14_bench_2.log 2>&1 \
    || echo "FAILED bench_steady_2"

step DONE
