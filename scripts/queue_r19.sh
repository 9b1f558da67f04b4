#!/bin/bash
# Round-5 chip queue #19: restore a 7/7-TRAINED variant sweep.
#   The r17 sweep refresh silently ran 5/7 rows on calibrated (perturbed)
#   weights — the resets had wiped the exact-named trained checkpoints —
#   and calibrated corner densities make the 101 v2 rows unrealistically
#   light (cand_max 55 vs 1870 trained).  BENCH_variants.jsonl was
#   reverted to the all-trained r11 sweep; this queue regenerates the
#   missing trunks (seeded protocols identical to queue_r5 — reproduce
#   the logged evals), restores the v2 row names from the committed v2c
#   champions, and re-sweeps with every row on trained weights.
#   After DONE the chip stays QUIET for the driver's round-end bench.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r19.sh > /tmp/queue_r19.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
FLAG=models/denet34_skip_synth512.mdl.gz
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r18
r18_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r18.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r18.log 2>/dev/null && break
    r18_alive || { echo "queue_r18 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r19.pid

step restore_v2_names
[ -f $V/denet101_wide_v2.mdl.gz ] || cp $V/denet101_wide_v2c.mdl.gz $V/denet101_wide_v2.mdl.gz
[ -f $V/denet101_wide_x768_v2.mdl.gz ] || cp $V/denet101_wide_x768_v2c.mdl.gz $V/denet101_wide_x768_v2.mdl.gz

step skip34_v1
[ -f $V/denet34_skip_v1.mdl.gz ] || \
timeout 3000 $T --family 34 --variant skip --steps 16000 --init-model $FLAG \
   --out $V/denet34_skip_v1.mdl.gz \
   > /tmp/train_skip34_v1.log 2>&1 || echo "FAILED skip34_v1"

step skip101_v1
[ -f $V/denet101_skip_v1.mdl.gz ] || \
timeout 3000 $T --family 101 --variant skip --steps 20000 \
   --out $V/denet101_skip_v1.mdl.gz \
   > /tmp/train_skip101_v1.log 2>&1 || echo "FAILED skip101_v1"

step wide101_v1
[ -f $V/denet101_wide_v1.mdl.gz ] || { [ -f $V/denet101_skip_v1.mdl.gz ] && \
timeout 3600 $T --family 101 --variant wide --dnc 'DNC[48,100]' --steps 16000 \
   --init-prefix $V/denet101_skip_v1.mdl.gz \
   --out $V/denet101_wide_v1.mdl.gz \
   > /tmp/train_wide101_v1.log 2>&1 ; } || echo "FAILED wide101_v1"

step sweep_trained
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    --out /tmp/variant_rates_r19.jsonl \
    > /tmp/bench_variants_r19.log 2>&1 || echo "FAILED sweep_trained"
if [ "$(wc -l < /tmp/variant_rates_r19.jsonl 2>/dev/null)" = "7" ] && \
   [ "$(grep -c '"weights": "trained"' /tmp/variant_rates_r19.jsonl)" = "7" ]; then
    cp /tmp/variant_rates_r19.jsonl BENCH_variants.jsonl
    git add BENCH_variants.jsonl && \
    git commit -m "variant sweep: all 7 rows on trained weights under the combined pool_inv lowering" \
        > /tmp/commit_sweep_r19.log 2>&1 || echo "FAILED commit_sweep"
else
    echo "sweep not 7/7 trained — BENCH_variants.jsonl left at the reverted trained rows"
fi

step DONE
