#!/bin/bash
# Second TPU measurement queue (sequential; ONE TPU process at a time,
# no kill timeouts — docs/BENCHMARKS.md + CLAUDE.md measurement rules).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue2.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue2 start $(date) ==="

echo "--- [1] kernel smoke incl. halo kernels (compiled numerics) ---"
python tools/tpu_kernel_smoke.py

echo "--- [2] train_bench random-shift pair=off (mode-path head-pair A/B) ---"
python benchmarks/train_bench.py --batch 64 --random-shift --pair off

echo "--- [3] kernel smoke with BF16_EXP (compiled numerics under flag) ---"
VIL_TPU_BF16_EXP=1 python tools/tpu_kernel_smoke.py

echo "--- [4] bench.py with BF16_EXP (inference A/B) ---"
VIL_TPU_BF16_EXP=1 python bench.py

echo "--- [5] train_bench with BF16_EXP ---"
VIL_TPU_BF16_EXP=1 python benchmarks/train_bench.py --batch 64

echo "=== tpu_ab_queue2 done $(date) ==="
