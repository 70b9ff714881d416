#!/bin/bash
# Sequential TPU measurement queue — fire once the axon tunnel recovers.
# ONE TPU process at a time (docs/BENCHMARKS.md measurement rule); each step
# runs to completion before the next starts. No kill timeouts (CLAUDE.md:
# killing TPU-using processes wedges the tunnel).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue start $(date) ==="

echo "--- [1] kernel smoke (compiled numerics) ---"
python tools/tpu_kernel_smoke.py

echo "--- [2] bwd_bench pair=on stages 1,2 ---"
python benchmarks/bwd_bench.py --batch 64 --stages 1,2 --bias --pair on

echo "--- [3] bwd_bench pair=off stages 1,2 ---"
python benchmarks/bwd_bench.py --batch 64 --stages 1,2 --bias --pair off

echo "--- [4] train_bench (pair auto=on) ---"
python benchmarks/train_bench.py --batch 64

echo "--- [5] train_bench random-shift (pair auto=on) ---"
python benchmarks/train_bench.py --batch 64 --random-shift

echo "--- [6] train_bench with layout hint (relayout-tax A/B) ---"
VIL_TPU_LAYOUT_HINT=1 python benchmarks/train_bench.py --batch 64

echo "--- [7] bench.py (headline + warm cache for the driver) ---"
python bench.py

echo "=== tpu_ab_queue done $(date) ==="
