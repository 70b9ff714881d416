#!/bin/bash
# Third TPU measurement queue (sequential; ONE TPU process at a time,
# no kill timeouts — docs/BENCHMARKS.md + CLAUDE.md measurement rules).
# Measures the new default: bf16-exp probabilities in fwd AND bwd kernels.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue3.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue3 start $(date) ==="

echo "--- [1] kernel smoke (bf16-exp default, fwd+bwd) ---"
python tools/tpu_kernel_smoke.py

echo "--- [2] train_bench (bf16-exp bwd) ---"
python benchmarks/train_bench.py --batch 64

echo "--- [3] train_bench random-shift (bf16-exp bwd) ---"
python benchmarks/train_bench.py --batch 64 --random-shift

echo "--- [4] bench.py headline (bf16-exp default) ---"
python bench.py

echo "--- [5] train-step profile trace (batch 64) ---"
python tools/profile_model.py --train --batch 64 --out /tmp/vil_profile_r2d
python tools/trace_ops.py /tmp/vil_profile_r2d --top 30
python tools/trace_ops.py /tmp/vil_profile_r2d --like copy --top 20

echo "--- [6] huge-image single-chip: ViL-Small @1024^2 inference, batch 4 ---"
python benchmarks/model_bench.py --arch vil_small --img 1024 --batch 4

echo "--- [7] 384 train with head-pair + bf16-exp ---"
python benchmarks/train_bench.py --batch 16 --img 384 --arch vil_medium_deep

echo "=== tpu_ab_queue3 done $(date) ==="
