#!/bin/bash
# Queue 5b: the BF16_SCORES=1 arms of queue 5, re-run after the epilogue-cast
# fix (Mosaic requires 32-bit matmul accumulators — the original
# preferred_element_type=bf16 form failed verification at lowering).
# ONE TPU process at a time; no kill timeouts.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export VIL_TPU_BF16_SCORES=1
LOG=/tmp/ab_queue5b.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue5b start $(date) ==="

echo "--- [1] kernel smoke, BF16_SCORES=1 (compiled numerics gate) ---"
python tools/tpu_kernel_smoke.py

echo "--- [2] kernel_bench stages 1,2 BF16_SCORES=1 ---"
python benchmarks/kernel_bench.py --batch 128 --stages 1,2

echo "--- [3] bench.py headline BF16_SCORES=1 ---"
python bench.py

echo "--- [4] train_bench batch 64 BF16_SCORES=1 ---"
python benchmarks/train_bench.py --batch 64

echo "=== tpu_ab_queue5b done $(date) ==="
