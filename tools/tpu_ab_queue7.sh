#!/bin/bash
# Seventh TPU measurement queue (r4 tail): the two open roadmap items —
#   (a) TPU.STACKED_OPT A/B (stack same-shape small leaves for the adamw
#       update; bitcast-free sibling of the FLAT_OPT dead end),
#   (b) 1024² q-tiled dense-backward tile sweep (stage-3 N=4097 defaults to
#       tq=32 from the conservative VMEM estimate; tq=64 fits the actual
#       100 MB scope and doubles the GEMM row density).
# ONE TPU process at a time; no kill timeouts (the tunnel wedges).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/ab_queue7.log
exec >> "$LOG" 2>&1

echo "=== tpu_ab_queue7 start $(date) ==="

echo "--- [1] train 224 b64 CONTROL (cached compile) ---"
python benchmarks/train_bench.py --batch 64

echo "--- [2] train 224 b64 --stacked-opt ---"
python benchmarks/train_bench.py --batch 64 --stacked-opt

echo "--- [3] train 1024 b4 CONTROL ---"
python benchmarks/train_bench.py --batch 4 --img 1024

echo "--- [4] train 1024 b4, dense bwd tile 4097:64 (vs default 32) ---"
VIL_TPU_DENSE_TILE_Q_BWD=4097:64 \
  python benchmarks/train_bench.py --batch 4 --img 1024

echo "--- [5] inference 1024 b4, dense fwd tile 4097:256 (vs default 128; may exceed the 100 MB scope and abort — that closes the question) ---"
VIL_TPU_DENSE_TILE_Q=4097:256 \
  python benchmarks/model_bench.py --batch 4 --img 1024 || echo "RUN 5 FAILED (expected if over-scope)"

echo "=== tpu_ab_queue7 done $(date) ==="
