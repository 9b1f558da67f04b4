#!/bin/bash
# Round-3 chip queue (relaunch after machine reset wiped /tmp and
# models/variants/).  Regenerates every lost variant checkpoint with the
# warm-start protocol from PERF.md "Round 3: variant retraining", then the
# x768 evals, the cap probe, the train-bench scan, and the trained-weights
# sweep refresh.  Run detached:
#   setsid bash scripts/queue_r3f.sh > /tmp/queue_r3f.log 2>&1 &
#   echo $! > /tmp/queue_r3f.pid
set -u
cd /root/repo
mkdir -p models/variants
V=models/variants
FLAG=models/denet34_skip_synth512.mdl.gz
T="timeout 7200 python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

# 1. wide34 v1: prefix warm-start from the skip flagship, corner factor
#    rebalanced (PERF.md wide-training diagnosis).
step wide34_v1
[ -f $V/denet34_wide_v1.mdl.gz ] || \
$T --family 34 --variant wide --dnc 'DNC[48,100]' --steps 16000 \
   --init-prefix $FLAG --out $V/denet34_wide_v1.mdl.gz \
   > /tmp/train_wide34_v1.log 2>&1 || echo "FAILED wide34_v1"

# 2. wide34 v2: trunk from retrained wide_v1 (two-generation warm start).
step wide34_v2
[ -f $V/denet34_wide_v2.mdl.gz ] || { [ -f $V/denet34_wide_v1.mdl.gz ] && \
$T --family 34 --variant wide --v2 --dnc 'DNC[48,100]' --steps 16000 \
   --init-trunk $V/denet34_wide_v1.mdl.gz --out $V/denet34_wide_v2.mdl.gz \
   > /tmp/train_wide34_v2.log 2>&1 ; } || echo "FAILED wide34_v2"

# 3. skip34 v1 sweep row: continue the flagship 16k on the hard dist.
step skip34_v1
[ -f $V/denet34_skip_v1.mdl.gz ] || \
$T --family 34 --variant skip --steps 16000 --init-model $FLAG \
   --out $V/denet34_skip_v1.mdl.gz \
   > /tmp/train_skip34_v1.log 2>&1 || echo "FAILED skip34_v1"

# 4. skip101 v1: from scratch, 20k (no shape-matched warm start available).
step skip101_v1
[ -f $V/denet101_skip_v1.mdl.gz ] || \
$T --family 101 --variant skip --steps 20000 \
   --out $V/denet101_skip_v1.mdl.gz \
   > /tmp/train_skip101_v1.log 2>&1 || echo "FAILED skip101_v1"

# 5. wide101 v1: prefix warm-start from skip101.
step wide101_v1
[ -f $V/denet101_wide_v1.mdl.gz ] || { [ -f $V/denet101_skip_v1.mdl.gz ] && \
$T --family 101 --variant wide --dnc 'DNC[48,100]' --steps 16000 \
   --init-prefix $V/denet101_skip_v1.mdl.gz \
   --out $V/denet101_wide_v1.mdl.gz \
   > /tmp/train_wide101_v1.log 2>&1 ; } || echo "FAILED wide101_v1"

# 6. wide101 v2: trunk from wide101 v1.
step wide101_v2
[ -f $V/denet101_wide_v2.mdl.gz ] || { [ -f $V/denet101_wide_v1.mdl.gz ] && \
$T --family 101 --variant wide --v2 --dnc 'DNC[48,100]' --steps 16000 \
   --init-trunk $V/denet101_wide_v1.mdl.gz \
   --out $V/denet101_wide_v2.mdl.gz \
   > /tmp/train_wide101_v2.log 2>&1 ; } || echo "FAILED wide101_v2"

# 7. jointfit extended budget (36k) — feature-matrix addendum: does the
#    401-way head close the gap with 3x the steps?
step jointfit36k
[ -f $V/matrix_jointfit36k.mdl.gz ] || \
timeout 10000 python -u scripts/train_flagship_synth.py --dist hard \
   --eval-batches 12 --eval-soft-nms \
   --dnd 'DND.J[0.5,1,1]' --init-trunk $FLAG --head-copy 0 --steps 36000 \
   --out $V/matrix_jointfit36k.mdl.gz \
   > /tmp/train_jointfit36k.log 2>&1 || echo "FAILED jointfit36k"

# 8. x768 with trained weights (VERDICT item 8): flagship transplant…
step x768_flagship
timeout 3600 python -u scripts/x768_eval.py --dist hard \
   > /tmp/x768_eval_flagship.log 2>&1 || echo "FAILED x768_flagship"

# …and the 101wide_v2 surgery, saved as the x768 sweep checkpoint.
step x768_101wide_v2
[ -f $V/denet101_wide_x768_v2.mdl.gz ] || { [ -f $V/denet101_wide_v2.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py --dist hard \
   --model $V/denet101_wide_v2.mdl.gz --size 768 --sample-num 36 \
   --out $V/denet101_wide_x768_v2.mdl.gz \
   > /tmp/x768_eval_101wide_v2.log 2>&1 ; } || echo "FAILED x768_101wide_v2"

# 9. cluster-cap probe on the retrained wide34_v2.
step cap_probe
[ -f $V/denet34_wide_v2.mdl.gz ] && \
timeout 3600 python -u scripts/probe_cluster_cap.py \
   --model $V/denet34_wide_v2.mdl.gz \
   > /tmp/probe_cap_v2c.log 2>&1 || echo "FAILED cap_probe"

# 10. train-loop bench: base + scan sections (own processes — compile cost).
step bench_train
timeout 3600 python -u scripts/bench_train.py --sections base \
   > /tmp/bench_train_base.log 2>&1 || echo "FAILED bench_train_base"
timeout 3600 python -u scripts/bench_train.py --sections scan \
   > /tmp/bench_train_scan.log 2>&1 || echo "FAILED bench_train_scan"

# 11. trained-weights sweep refresh.
step bench_variants
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
   > /tmp/bench_variants_r3f.log 2>&1 || echo "FAILED bench_variants"

step DONE
