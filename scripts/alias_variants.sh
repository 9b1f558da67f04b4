#!/bin/bash
# Alias the round-4 retrained (b-protocol) checkpoints to the generic sweep
# tag names so bench_variants --models-dir finds trained weights for the
# denet101 rows (the tags denote desc configs; the b checkpoints ARE those
# configs, trained with the round-4 warm-start protocol).  Runs until the
# r5 queue's DONE marker; hardlinks are idempotent and instant.
set -u
cd /root/repo/models/variants
while true; do
    [ -f denet101_skip_v1b.mdl.gz ] && [ ! -f denet101_skip_v1.mdl.gz ] && \
        ln -f denet101_skip_v1b.mdl.gz denet101_skip_v1.mdl.gz
    [ -f denet101_wide_v1b.mdl.gz ] && [ ! -f denet101_wide_v1.mdl.gz ] && \
        ln -f denet101_wide_v1b.mdl.gz denet101_wide_v1.mdl.gz
    [ -f denet101_wide_v2b.mdl.gz ] && [ ! -f denet101_wide_v2.mdl.gz ] && \
        ln -f denet101_wide_v2b.mdl.gz denet101_wide_v2.mdl.gz
    grep -q "=== .* DONE ===" /tmp/queue_r5.log 2>/dev/null && break
    sleep 60
done
echo "alias daemon done $(date)"
