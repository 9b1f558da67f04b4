#!/bin/bash
# Round-4 regeneration queue (relaunch after the Aug-18 machine reset wiped
# /tmp and models/variants/ again).  The r4 queue HAD completed its training
# chain — the eval evidence survives in artifacts/r3_logs/train_*.log — but:
#   * the occlusion-study and profile_wide logs went to /tmp names the
#     watcher didn't sweep (lost),
#   * the fixed-BN x768 re-runs never executed (queue_r4.sh was edited while
#     running; bash skipped to DONE),
#   * every checkpoint except the committed wide34_v2 was wiped.
# This queue re-validates the BN fix first, reruns the two lost studies,
# regenerates the checkpoint chain (seeded — should reproduce the logged
# evals), then the x768 surgery row and a bench refresh, and finally
# commits the wide101_v2b flagship checkpoint so the next reset cannot
# destroy it (VERDICT r3 item 7).
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING (see queue_r4 postmortem).
# Run detached:
#   setsid bash scripts/queue_r5.sh > /tmp/queue_r5.log 2>&1 &
#   echo $! > /tmp/queue_r5.pid
set -u
cd /root/repo
mkdir -p models/variants
V=models/variants
FLAG=models/denet34_skip_synth512.mdl.gz
T="timeout 7200 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

echo $$ > /tmp/queue_r5.pid
setsid bash scripts/queue_log_watcher.sh /tmp/queue_r5.log \
    > /tmp/log_watcher_r5.log 2>&1 &
echo $! > /tmp/log_watcher.pid

# 1. validate the update_bn fix on hardware FIRST (no deps; the committed
#    x768 logs are pre-fix 0.0-mAP runs).
step x768_flagship_fixed
timeout 3600 python -u scripts/x768_eval.py --dist hard \
    > /tmp/x768_eval_flagship2.log 2>&1 || echo "FAILED x768_flagship_fixed"

# 2. occlusion study on the committed wide34_v2 (VERDICT item 4 rerun).
step occlusion_study
[ -f $V/denet34_wide_v2.mdl.gz ] && \
timeout 5400 python -u scripts/occlusion_study.py \
    --model $V/denet34_wide_v2.mdl.gz --batches 12 \
    > /tmp/eval_occl_study.log 2>&1 || echo "FAILED occlusion_study"

# 3. wide serving profile (VERDICT item 3 rerun).
step profile_wide
[ -f $V/denet34_wide_v2.mdl.gz ] && \
timeout 3600 python -u scripts/profile_wide.py \
    --model $V/denet34_wide_v2.mdl.gz \
    > /tmp/eval_profile_wide.log 2>&1 || echo "FAILED profile_wide"

# 4. regenerate the donor + 101-family chain (protocols identical to
#    queue_r3f/queue_r4 — seeded, reproduces the logged evals).
step skip34_v1
[ -f $V/denet34_skip_v1.mdl.gz ] || \
$T --family 34 --variant skip --steps 16000 --init-model $FLAG \
   --out $V/denet34_skip_v1.mdl.gz \
   > /tmp/train_skip34_v1.log 2>&1 || echo "FAILED skip34_v1"

step skip101_v1b
[ -f $V/denet101_skip_v1b.mdl.gz ] || { [ -f $V/denet34_skip_v1.mdl.gz ] && \
$T --family 101 --variant skip --steps 28000 \
   --init-suffix $V/denet34_skip_v1.mdl.gz \
   --out $V/denet101_skip_v1b.mdl.gz \
   > /tmp/train_skip101_v1b.log 2>&1 ; } || echo "FAILED skip101_v1b"

step wide34_v1
[ -f $V/denet34_wide_v1.mdl.gz ] || \
$T --family 34 --variant wide --dnc 'DNC[48,100]' --steps 16000 \
   --init-prefix $FLAG --out $V/denet34_wide_v1.mdl.gz \
   > /tmp/train_wide34_v1.log 2>&1 || echo "FAILED wide34_v1"

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

# 5. commit the round's flagship checkpoint IMMEDIATELY (reset durability).
step commit_flagship
if [ -f $V/denet101_wide_v2b.mdl.gz ]; then
    git add -f $V/denet101_wide_v2b.mdl.gz && \
    git commit -m "preserve wide101_v2b flagship checkpoint in git" \
        -- $V/denet101_wide_v2b.mdl.gz \
        >/dev/null 2>>/tmp/queue_git.err || echo "FAILED commit_flagship"
fi

# 6. x768 surgery on wide101_v2b with the fixed BN, saved as the sweep
#    checkpoint.
step x768_101wide_v2b
[ -f $V/denet101_wide_v2b.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py --dist hard \
    --model $V/denet101_wide_v2b.mdl.gz --size 768 --sample-num 36 \
    --out $V/denet101_wide_x768_v2.mdl.gz \
    --tag denet101_wide_x768_v2 --baseline-hz 11.0 \
    > /tmp/x768_eval_101wide_v2b.log 2>&1 || echo "FAILED x768_101wide_v2b"

# 7. trained-weights sweep refresh over the regenerated checkpoints.
step bench_variants
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    > /tmp/bench_variants_r5.log 2>&1 || echo "FAILED bench_variants"

step DONE
