#!/bin/bash
# Fourth TPU measurement queue (sequential; ONE TPU process at a time,
# no kill timeouts — docs/BENCHMARKS.md + CLAUDE.md measurement rules).
# Settles the bf16-exp headline A/B and refreshes the train numbers.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue4.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue4 start $(date) ==="

echo "--- [1] bench.py headline, bf16-exp ON (default) ---"
python bench.py

echo "--- [2] bench.py headline, bf16-exp OFF ---"
VIL_TPU_BF16_EXP=0 python bench.py

echo "--- [3] train_bench batch 64, bf16-exp ON ---"
python benchmarks/train_bench.py --batch 64

echo "--- [4] train_bench batch 64 random-shift, bf16-exp ON ---"
python benchmarks/train_bench.py --batch 64 --random-shift

echo "=== tpu_ab_queue4 done $(date) ==="
