#!/bin/bash
# queue_r10: wide detect-phase attack inputs (VERDICT r4 item 4) + x768
# batch probe (item 8).  Every entry takes chip_lease itself; blocks run
# serially.  DONE marker at the end per queue discipline.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
{
  echo "=== [$(date +%T)] profile_wide v2 trained ==="
  timeout 1800 python -u scripts/profile_wide.py --model models/variants/denet34_wide_v2.mdl.gz > /tmp/r10_profile_wide.log 2>&1
  echo "=== [$(date +%T)] analyze_hlo wide v2 cap2304 ==="
  timeout 1800 python -u scripts/analyze_hlo.py --variant wide --v2 --cluster-cap 2304 > /tmp/r10_hlo_wide.log 2>&1
  echo "=== [$(date +%T)] x768 batch probe b8/b4/b16 ==="
  for b in 8 4 16; do
    timeout 1800 python -u scripts/bench_variants.py --only denet101_wide_x768_v2 --models-dir models/variants --batch $b --out /tmp/r10_x768_batch.jsonl >> /tmp/r10_x768_batch.log 2>&1
  done
  echo "=== [$(date +%T)] DONE ==="
} > /tmp/queue_r10.log 2>&1
