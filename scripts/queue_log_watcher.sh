#!/bin/bash
# Checkpoint round-3 queue logs into git every few minutes so training-eval
# evidence survives machine resets (the round-2/3 resets wiped /tmp AND the
# gitignored models/variants checkpoints — logs are the only durable record
# of the eval numbers).  Run detached:
#   setsid bash scripts/queue_log_watcher.sh > /tmp/log_watcher.log 2>&1 &
set -u
cd /root/repo
mkdir -p artifacts/r3_logs
while true; do
    cp -f /tmp/queue_r3f.log /tmp/train_*.log /tmp/probe_*.log \
          /tmp/bench_*.log /tmp/x768_eval*.log artifacts/r3_logs/ 2>/dev/null
    if ! git diff --quiet -- artifacts/r3_logs || \
       [ -n "$(git status --porcelain artifacts/r3_logs)" ]; then
        git add artifacts/r3_logs >/dev/null 2>&1
        git commit -m "auto: round-3 queue log checkpoint" \
            -- artifacts/r3_logs >/dev/null 2>&1
    fi
    grep -q "=== .* DONE ===" /tmp/queue_r3f.log 2>/dev/null && break
    sleep 300
done
# final sweep after DONE
cp -f /tmp/queue_r3f.log /tmp/train_*.log /tmp/probe_*.log \
      /tmp/bench_*.log /tmp/x768_eval*.log artifacts/r3_logs/ 2>/dev/null
git add artifacts/r3_logs >/dev/null 2>&1
git commit -m "auto: round-3 queue logs final" -- artifacts/r3_logs >/dev/null 2>&1
