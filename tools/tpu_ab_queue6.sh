#!/bin/bash
# Sixth TPU measurement queue: stage-1 forward kernel ANATOMY via the
# timing-only VIL_TPU_ABLATE knob (nocomb/nomax/nosm — wrong numerics,
# timing only) and the nglo=0 stage variant. Run AFTER tpu_ab_queue5
# settles the BF16_SCORES default; pass the winning flag value as $1
# (default 0). ONE TPU process at a time; no kill timeouts.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export VIL_TPU_BF16_SCORES=${1:-0}
LOG=/tmp/ab_queue6.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue6 start $(date) BF16_SCORES=$VIL_TPU_BF16_SCORES ==="

echo "--- [1] stage 1 + 1g0, full kernel (baseline) ---"
python benchmarks/kernel_bench.py --batch 128 --stages 1,1g0

echo "--- [2] ABLATE=nocomb (no bias+mask score add) ---"
VIL_TPU_ABLATE=nocomb python benchmarks/kernel_bench.py --batch 128 --stages 1

echo "--- [3] ABLATE=nomax (exp without max subtraction) ---"
VIL_TPU_ABLATE=nomax python benchmarks/kernel_bench.py --batch 128 --stages 1

echo "--- [4] ABLATE=nosm (no softmax at all: GEMM+concat+add floor) ---"
VIL_TPU_ABLATE=nosm python benchmarks/kernel_bench.py --batch 128 --stages 1

echo "=== tpu_ab_queue6 done $(date) ==="
