#!/bin/bash
# Round-5 chip queue #17: the budget series' 4th point + the reference's
# best-row protocol.
#   1. wide34_v2f: FRESH 192k seeded run (16k/48k/96k showed no saturation;
#      96k->192k tests whether the hard-distribution ceiling is finally in
#      reach).  Same protocol as v2e (trunk-warm-start from wide34_v1,
#      mid-run checkpoints every 8k), committed to git on landing.
#   2. x768 surgery + eval on v2f.
#   3. 768-NATIVE fine-tune of the surgery model (12k steps @ lr 2e-3) —
#      the reference's best published row trains at 768 natively
#      (README.md:128); surgery-only recalibrates BN but never trains the
#      head at the denser corner grid, which round-5 measured as the
#      occluded-stratum regression.  b8 first, b4 fallback if 768-training
#      OOMs.
#   4. Full sweep refresh (pool_inv combined default landed this session)
#      -> BENCH_variants.jsonl if all 7 rows measured.
#   5. One cold bench.py validation of the 852 img/s headline.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r17.sh > /tmp/queue_r17.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

echo $$ > /tmp/queue_r17.pid

step train_wide34_v2f_192k
[ -f $V/denet34_wide_v1.mdl.gz ] && \
timeout 13000 $T --family 34 --variant wide --v2 --dnc 'DNC[48,100]' \
    --steps 192000 --save-every 8000 \
    --init-trunk $V/denet34_wide_v1.mdl.gz \
    --out $V/denet34_wide_v2f.mdl.gz \
    > /tmp/train_wide34_v2f.log 2>&1 || echo "FAILED train_wide34_v2f"

step commit_v2f
if [ -f $V/denet34_wide_v2f.mdl.gz ]; then
    git add -f $V/denet34_wide_v2f.mdl.gz && \
    git commit -m "preserve wide34_v2f 192k checkpoint (reset durability)" \
        > /tmp/commit_v2f.log 2>&1 || echo "FAILED commit_v2f"
fi

step x768_wide34_v2f
[ -f $V/denet34_wide_v2f.mdl.gz ] && \
timeout 3600 python -u scripts/x768_eval.py \
    --model $V/denet34_wide_v2f.mdl.gz \
    --out $V/denet34_wide_x768_v2f.mdl.gz \
    --tag denet34_wide_x768_v2f \
    > /tmp/x768_eval_34wide_v2f.log 2>&1 || echo "FAILED x768_wide34_v2f"

step commit_x768_v2f
if [ -f $V/denet34_wide_x768_v2f.mdl.gz ]; then
    git add -f $V/denet34_wide_x768_v2f.mdl.gz && \
    git commit -m "preserve wide34 x768_v2f surgery checkpoint" \
        > /tmp/commit_x768_v2f.log 2>&1 || echo "FAILED commit_x768_v2f"
fi

step ft768_wide34_v2f
if [ -f $V/denet34_wide_x768_v2f.mdl.gz ]; then
    timeout 7200 $T --size 768 --steps 12000 --lr 0.002 --save-every 4000 \
        --init-model $V/denet34_wide_x768_v2f.mdl.gz \
        --out $V/denet34_wide_x768_v2f_ft.mdl.gz \
        > /tmp/train_x768_v2f_ft.log 2>&1 || echo "FAILED ft768 b8"
    if [ ! -f $V/denet34_wide_x768_v2f_ft.mdl.gz ]; then
        echo "retrying 768 fine-tune at b4"
        timeout 7200 $T --size 768 --batch 4 --steps 12000 --lr 0.002 \
            --save-every 4000 \
            --init-model $V/denet34_wide_x768_v2f.mdl.gz \
            --out $V/denet34_wide_x768_v2f_ft.mdl.gz \
            > /tmp/train_x768_v2f_ft_b4.log 2>&1 || echo "FAILED ft768 b4"
    fi
fi

step commit_ft768
if [ -f $V/denet34_wide_x768_v2f_ft.mdl.gz ]; then
    git add -f $V/denet34_wide_x768_v2f_ft.mdl.gz && \
    git commit -m "preserve wide34 x768_v2f 768-native fine-tune checkpoint" \
        > /tmp/commit_ft768.log 2>&1 || echo "FAILED commit_ft768"
fi

step sweep_poolinv
timeout 7200 python -u scripts/bench_variants.py --models-dir $V \
    --out /tmp/variant_rates_r17.jsonl \
    > /tmp/bench_variants_r17.log 2>&1 || echo "FAILED sweep_poolinv"
if [ "$(wc -l < /tmp/variant_rates_r17.jsonl 2>/dev/null)" = "7" ]; then
    cp /tmp/variant_rates_r17.jsonl BENCH_variants.jsonl
    git add BENCH_variants.jsonl && \
    git commit -m "refresh variant sweep under the combined pool_inv lowering" \
        > /tmp/commit_sweep_r17.log 2>&1 || echo "FAILED commit_sweep"
fi

step bench_validation
timeout 1800 python -u bench.py > /tmp/r17_bench.log 2>&1 \
    || echo "FAILED bench_validation"

step DONE
