#!/bin/bash
# Round-5 chip queue #20: 768-native fine-tune on the reference's BEST-ROW
#   config (DeNet101-wide-x768-v2, /root/reference/README.md:128).  The
#   wide34 ft arm (queue_r17) measured the protocol's value (+0.108 COCO
#   in 12k steps, occluded stratum recovered); this applies it to the
#   101-family champion surgery model (denet101_wide_x768_v2c, committed).
#   Committed to git on landing.  After DONE the chip stays QUIET for the
#   driver's round-end bench.
# NEVER EDIT THIS FILE WHILE THE QUEUE IS RUNNING.
# Run detached:
#   setsid bash scripts/queue_r20.sh > /tmp/queue_r20.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V=models/variants
T="python -u scripts/train_flagship_synth.py --dist hard --eval-batches 12 --eval-soft-nms"

step() { echo "=== [$(date +%H:%M:%S)] $1 ==="; }

step wait_r19
r19_alive() {
    for p in /proc/[0-9]*/cmdline; do
        tr '\0' ' ' < "$p" 2>/dev/null | grep -q "queue_r19.sh" && return 0
    done
    return 1
}
while true; do
    grep -q "=== .* DONE ===" /tmp/queue_r19.log 2>/dev/null && break
    r19_alive || { echo "queue_r19 not alive and no DONE marker — proceeding"; break; }
    sleep 60
done

echo $$ > /tmp/queue_r20.pid

step ft768_wide101_x768_v2c
[ -f $V/denet101_wide_x768_v2c.mdl.gz ] && \
timeout 6000 $T --size 768 --steps 12000 --lr 0.002 --save-every 4000 \
    --init-model $V/denet101_wide_x768_v2c.mdl.gz \
    --out $V/denet101_wide_x768_v2c_ft.mdl.gz \
    > /tmp/train_x768_101_ft.log 2>&1 || echo "FAILED ft768_101 b8"
if [ ! -f $V/denet101_wide_x768_v2c_ft.mdl.gz ]; then
    echo "retrying 101 768 fine-tune at b4"
    timeout 8000 $T --size 768 --batch 4 \
        --steps 12000 --lr 0.002 --save-every 4000 \
        --init-model $V/denet101_wide_x768_v2c.mdl.gz \
        --out $V/denet101_wide_x768_v2c_ft.mdl.gz \
        > /tmp/train_x768_101_ft_b4.log 2>&1 || echo "FAILED ft768_101 b4"
fi

step commit_ft101
if [ -f $V/denet101_wide_x768_v2c_ft.mdl.gz ]; then
    git add -f $V/denet101_wide_x768_v2c_ft.mdl.gz && \
    git commit -m "preserve wide101 x768_v2c 768-native fine-tune checkpoint" \
        > /tmp/commit_ft101.log 2>&1 || echo "FAILED commit_ft101"
fi

step DONE
