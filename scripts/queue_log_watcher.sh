#!/bin/bash
# Checkpoint chip-queue logs into git every few minutes so training-eval
# evidence survives machine resets (the round-2/3 resets wiped /tmp AND the
# gitignored models/variants checkpoints — logs are the only durable record
# of the eval numbers).  Run detached:
#   setsid bash scripts/queue_log_watcher.sh QUEUE_LOG \
#       > /tmp/log_watcher.log 2>&1 &
#
# Exits when the queue log contains the DONE marker OR when no queue/train
# python process is alive anymore (covers crashed/killed queues — ADVICE
# round-3 item 3).  git failures are logged, not discarded.
set -u
QUEUE_LOG=${1:-/tmp/queue_r4.log}
cd /root/repo
mkdir -p artifacts/r3_logs

queue_alive() {
    # any queue shell or training/eval/bench python still running?
    for pidf in /tmp/queue_*.pid; do
        [ -f "$pidf" ] || continue
        pid=$(cat "$pidf" 2>/dev/null)
        [ -n "$pid" ] && kill -0 "$pid" 2>/dev/null && return 0
    done
    # fall back: look for the scripts the queues launch (match by /proc
    # cmdline, never pkill-style pattern kills — read-only check)
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -qE \
            'scripts/(train_flagship_synth|x768_eval|probe_|bench_train|bench_variants|occlusion_study|profile_wide|ab_cap_policy|queue_r)' \
            && return 0
    done
    return 1
}

sweep() {
    cp -f /tmp/queue_*.log /tmp/train_*.log /tmp/probe_*.log \
          /tmp/bench_*.log /tmp/x768_eval*.log /tmp/eval_*.log \
          artifacts/r3_logs/ 2>/dev/null
    if [ -n "$(git status --porcelain artifacts/r3_logs)" ]; then
        git add artifacts/r3_logs 2>>/tmp/log_watcher_git.err
        git commit -m "auto: queue log checkpoint" -- artifacts/r3_logs \
            >/dev/null 2>>/tmp/log_watcher_git.err \
            || echo "[watcher] git commit failed $(date)" >&2
    fi
}

misses=0
while true; do
    sweep
    grep -q "=== .* DONE ===" "$QUEUE_LOG" 2>/dev/null && break
    if queue_alive; then misses=0; else
        misses=$((misses + 1))
        # require 3 consecutive dead polls (15 min) — queues sleep between
        # steps while yielding to bench, and pid files can be momentarily
        # stale right as one step hands off to the next
        [ $misses -ge 3 ] && { echo "[watcher] queue dead, exiting"; break; }
    fi
    sleep 300
done
sweep
echo "[watcher] final sweep done $(date)"
