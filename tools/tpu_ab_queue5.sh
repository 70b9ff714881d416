#!/bin/bash
# Fifth TPU measurement queue (sequential; ONE TPU process at a time,
# no kill timeouts — docs/BENCHMARKS.md + CLAUDE.md measurement rules).
# A/B for the BF16_SCORES experiment: bf16 end-to-end score tensors in the
# fused forward+backward kernels (MXU emits bf16; comb add / max / exp run
# packed-bf16; denominator + LSE stay f32).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue5.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue5 start $(date) ==="

echo "--- [1] kernel smoke, BF16_SCORES=1 (compiled numerics gate) ---"
VIL_TPU_BF16_SCORES=1 python tools/tpu_kernel_smoke.py

echo "--- [2] kernel_bench stages 1,2 OFF (baseline refresh) ---"
python benchmarks/kernel_bench.py --batch 128 --stages 1,2

echo "--- [3] kernel_bench stages 1,2 BF16_SCORES=1 ---"
VIL_TPU_BF16_SCORES=1 python benchmarks/kernel_bench.py --batch 128 --stages 1,2

echo "--- [4] bench.py headline OFF ---"
python bench.py

echo "--- [5] bench.py headline BF16_SCORES=1 ---"
VIL_TPU_BF16_SCORES=1 python bench.py

echo "--- [6] train_bench batch 64 OFF ---"
python benchmarks/train_bench.py --batch 64

echo "--- [7] train_bench batch 64 BF16_SCORES=1 ---"
VIL_TPU_BF16_SCORES=1 python benchmarks/train_bench.py --batch 64

echo "=== tpu_ab_queue5 done $(date) ==="
