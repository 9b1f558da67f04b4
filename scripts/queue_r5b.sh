#!/bin/bash
# Round-4 follow-up queue: waits for queue_r5.sh to drain, then runs the
# experiments the round-4 studies motivated:
#   * wide34_v2d — wide34_v2 protocol but with the occlusion-aware
#     distinct-second quota ACTIVE DURING TRAINING (the occlusion study
#     proved the occluded collapse is training-side: serving-time toggles
#     move it 0.056->0.060 at best while costing 0.036 COCO overall)
#   * occlusion study on v2d (same 3 serving arms)
#   * skip101_v1c / skip34_ctl48 — the 28k-protocol depth inversion at a
#     2x budget (48k): does the 101 trunk close the gap given more steps
#     (tests the "optimization-bound, not capacity-bound" diagnosis)?
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r5b.sh > /tmp/queue_r5b.log 2>&1 &
set -u
cd /root/repo
V=models/variants
T="timeout 10800 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# wait for queue_r5: DONE marker, or its process dead
step wait_r5
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r5.log 2>/dev/null && break
    pid=$(cat /tmp/queue_r5.pid 2>/dev/null)
    if [ -z "$pid" ] || ! kill -0 "$pid" 2>/dev/null; then
        echo "r5 queue process dead without DONE marker; proceeding"
        break
    fi
    sleep 120
done

echo $$ > /tmp/queue_r5b.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r5b.log \
    > /tmp/log_watcher_r5b.log 2>&1 &

# 1. training-side occlusion fix candidate
step wide34_v2d
[ -f $V/denet34_wide_v2d.mdl.gz ] || { [ -f $V/denet34_wide_v1.mdl.gz ] && \
DENET_TPU_CLUSTER_DISTINCT2=1 \
$T --family 34 --variant wide --v2 --dnc 'DNC[48,100]' --steps 16000 \
   --init-trunk $V/denet34_wide_v1.mdl.gz \
   --out $V/denet34_wide_v2d.mdl.gz \
   > /tmp/train_wide34_v2d.log 2>&1 ; } || echo "FAILED wide34_v2d"

step occl_study_v2d
[ -f $V/denet34_wide_v2d.mdl.gz ] && \
timeout 5400 python -u scripts/occlusion_study.py \
    --model $V/denet34_wide_v2d.mdl.gz --batches 12 \
    > /tmp/eval_occl_study_v2d.log 2>&1 || echo "FAILED occl_study_v2d"

# 2. depth inversion at 2x budget (48k, same transplant protocol)
step skip101_v1c
[ -f $V/denet101_skip_v1c.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 101 --variant skip --steps 48000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet101_skip_v1c.mdl.gz \
   > /tmp/train_skip101_v1c.log 2>&1 ; } || echo "FAILED skip101_v1c"

step skip34_ctl48
[ -f $V/denet34_skip_ctl48.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 34 --variant skip --steps 48000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet34_skip_ctl48.mdl.gz \
   > /tmp/train_skip34_ctl48.log 2>&1 ; } || echo "FAILED skip34_ctl48"

step DONE
