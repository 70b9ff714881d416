"""Multi-HOST (multi-process) validation of the distributed stack.

Spawns two OS processes, each with two virtual CPU devices, connected by
``jax.distributed.initialize`` over localhost (gloo collectives) — a real
2-host × 2-device global mesh, the same launch shape as a TPU pod (one
process per host; reference DDP init /root/reference/src/run_experiment.py:75-82).
The workers (tests/_multihost_worker.py) drive the actual ``run_experiment``
stack: cross-host collective helpers, a training epoch with checkpointing,
and an EVALUATE run whose per-image results are gathered onto the master.

The in-process tests (tests/test_distributed.py) cover multi-DEVICE
sharding; this covers the cross-PROCESS layer the driver's dryrun cannot:
per-host sampler shards, host-local batch assembly
(``make_array_from_process_local_data``), gloo-backed object gathers, and
main-process-only artifact ownership.
"""
import os
import socket
import subprocess
import sys

import numpy as np


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_two_device_training(tmp_path):
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_multihost_worker.py")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(r), str(nproc), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(nproc)
    ]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-4000:]}"
        assert f"WORKER {r} DONE" in out

    # master-host artifacts on the shared filesystem
    assert (tmp_path / "model_best.ckpt").exists()
    assert (tmp_path / "config.yaml").exists()
    data = np.load(tmp_path / "results_0.npz")
    n = 64  # SyntheticDataset: 8 × global batch 8
    assert sorted(data["indices"].tolist()) == list(range(n))
    assert data["pred_ids"].shape == (n, 5)
    assert data["pred_scores"].shape == (n, 5)
    assert data["targets"].shape == (n,)
    # rows were deduped from padded per-host shards: top-1 flag must agree
    # with the gathered prediction ids row-by-row
    agree = (data["pred_ids"][:, 0] == data["targets"]) == (
        data["scores"][:, 0] > 0.5
    )
    assert agree.all()
