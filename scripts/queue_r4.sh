#!/bin/bash
# Round-4 chip queue: waits for the round-3 queue (queue_r3f.sh) to drain,
# then runs the round-4 experiments (VERDICT round-3 items 2/3/4):
#   * occlusion study on wide34_v2 (clustered vs unclustered vs
#     distinct-second quota)
#   * profile_wide on the retrained wide34_v2 (serving residual diagnosis)
#   * 101-family retraining with the cross-family head warm-start
#     (--init-suffix): skip101_v1b + matched skip34 control, then the
#     wide101 chain rebuilt on the better trunk
# Run detached:
#   setsid bash scripts/queue_r4.sh > /tmp/queue_r4.log 2>&1 &
#   echo $! > /tmp/queue_r4.pid
set -u
cd /root/repo
mkdir -p models/variants
V=models/variants
T="timeout 7200 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# 0. wait for the r3f queue: DONE marker, or its process tree gone
step wait_r3f
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r3f.log 2>/dev/null && break
    pid=$(cat /tmp/queue_r3f.pid 2>/dev/null)
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
        echo "r3f queue process dead without DONE marker; proceeding"
        break
    fi
    sleep 120
done

# keep a log watcher alive for this queue's lifetime (the r3f watcher
# exits at r3f's DONE marker; a <=5min overlap of two watchers is a benign
# duplicate-commit race — failures are logged, not silenced)
echo $$ > /tmp/queue_r4.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r4.log \
    > /tmp/log_watcher_r4.log 2>&1 &
echo $! > /tmp/log_watcher.pid

# 1. occlusion study (VERDICT item 4): wide34_v2, 3 serving configs
step occlusion_study
[ -f $V/denet34_wide_v2.mdl.gz ] && \
timeout 5400 python -u scripts/occlusion_study.py \
    --model $V/denet34_wide_v2.mdl.gz --batches 12 \
    > /tmp/occl_study.log 2>&1 || echo "FAILED occlusion_study"

# 2. wide serving profile (VERDICT item 3)
step profile_wide
[ -f $V/denet34_wide_v2.mdl.gz ] && \
timeout 3600 python -u scripts/profile_wide.py \
    --model $V/denet34_wide_v2.mdl.gz \
    > /tmp/profile_wide_v2.log 2>&1 || echo "FAILED profile_wide"

# 3. skip101 with the trained-head warm start (VERDICT item 2): scratch
#    trunk + detection head transplanted from the trained skip34_v1
step skip101_v1b
[ -f $V/denet101_skip_v1b.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 101 --variant skip --steps 28000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet101_skip_v1b.mdl.gz \
   > /tmp/train_skip101_v1b.log 2>&1 ; } || echo "FAILED skip101_v1b"

# 4. matched 34-family control: SAME protocol (scratch trunk + transplanted
#    head + 28k) so the depth comparison is protocol-clean
step skip34_ctl
[ -f $V/denet34_skip_ctl.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 34 --variant skip --steps 28000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet34_skip_ctl.mdl.gz \
   > /tmp/train_skip34_ctl.log 2>&1 ; } || echo "FAILED skip34_ctl"

# 5. wide101 chain rebuilt on the better 101 trunk
step wide101_v1b
[ -f $V/denet101_wide_v1b.mdl.gz ] || { [ -f $V/denet101_skip_v1b.mdl.gz ] && \
$T --family 101 --variant wide --dnc 'DNC[48,100]' --steps 16000 \
   --init-prefix $V/denet101_skip_v1b.mdl.gz \
   --init-suffix $V/denet34_wide_v1.mdl.gz \
   --out $V/denet101_wide_v1b.mdl.gz \
   > /tmp/train_wide101_v1b.log 2>&1 ; } || echo "FAILED wide101_v1b"

step wide101_v2b
[ -f $V/denet101_wide_v2b.mdl.gz ] || { [ -f $V/denet101_wide_v1b.mdl.gz ] && \
$T --family 101 --variant wide --v2 --dnc 'DNC[48,100]' --steps 16000 \
   --init-trunk $V/denet101_wide_v1b.mdl.gz \
   --out $V/denet101_wide_v2b.mdl.gz \
   > /tmp/train_wide101_v2b.log 2>&1 ; } || echo "FAILED wide101_v2b"

# 6. x768 re-runs with the FIXED BN recalibration (the round-3 queue's
#    x768 evals ran with the inconsistent one-pass update_bn — measured
#    mAP 0.0; see PERF.md round-4 BN recalibration fix)
step x768_flagship_fixed
timeout 3600 python -u scripts/x768_eval.py --dist hard \
    > /tmp/x768_eval_flagship2.log 2>&1 || echo "FAILED x768_flagship_fixed"

step x768_101wide_v2b
[ -f $V/denet101_wide_v2b.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py --dist hard \
    --model $V/denet101_wide_v2b.mdl.gz --size 768 --sample-num 36 \
    --out $V/denet101_wide_x768_v2.mdl.gz \
    > /tmp/x768_eval_101wide_v2b.log 2>&1 || echo "FAILED x768_101wide_v2b"

# 7. refresh the x768 sweep row with the fixed checkpoint
step bench_x768_row
[ -f $V/denet101_wide_x768_v2.mdl.gz ] && \
timeout 3600 python -u scripts/bench_variants.py --models-dir $V \
    --only denet101_wide_x768_v2 \
    > /tmp/bench_x768_row.log 2>&1 || echo "FAILED bench_x768_row"

step DONE
