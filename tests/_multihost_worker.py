"""Subprocess body for tests/test_multihost.py — not collected by pytest.

Each worker forces the CPU platform, joins a gloo-backed jax.distributed
cluster (the TPU-pod launch shape: one process per host,
``jax.distributed.initialize`` replacing torch.distributed.launch —
reference /root/reference/src/run_experiment.py:75-82), then drives the REAL
experiment stack over the global 2-host × 2-device mesh:

1. collective helpers (reduce_dict / all_gather / gather_on_master /
   synchronize — reference utils/comm.py semantics),
2. ``run_experiment`` training: 1 epoch + per-epoch eval + checkpointing,
3. ``run_experiment`` EVALUATE=True on the saved checkpoint, producing the
   per-image results npz gathered onto the master host.
"""
import sys


def tiny_cfg(outdir: str):
    from vil_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.DATA.TRAIN = ("synthetic",)
    cfg.DATA.TEST = ("synthetic",)
    cfg.INPUT.IMAGE_SIZE = 32
    cfg.DATA.NUM_CLASSES = 10
    cfg.DATALOADER.BSZ = 8  # global batch: 4 per host, 2 per device
    cfg.DATALOADER.WORKERS = 0
    # three minimal stages, one block each: the point here is the
    # cross-PROCESS machinery, and every XLA program compiles twice (once
    # per host process) on this box — keep the graphs as small as MsViT
    # allows (3-stage minimum, reference msvit.py arch grammar)
    cfg.MODEL.VIT.MSVIT.ARCH = (
        "l1,h1,d16,n1,s1,g1,p4,f2_l2,h1,d16,n1,s1,g1,p2,f2_l3,h1,d16,n1,s0,g0,p2,f2"
    )
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OPTIM.EPOCHS = 1
    cfg.OPTIM.LR = 1e-3
    cfg.OUTPUT_DIR = outdir
    return cfg


def main():
    coord, rank, nproc, outdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: the heavy SPMD programs compile once per
    # process; cache hits make test reruns (and the second phase) cheap
    from vil_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()
    jax.distributed.initialize(coord, num_processes=nproc, process_id=rank)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 2, jax.local_devices()
    assert jax.device_count() == 2 * nproc

    import numpy as np

    from vil_tpu.parallel import collectives

    # --- collective helpers across real processes ---
    red = collectives.reduce_dict({"a": float(rank), "b": 2.0}, average=True)
    assert abs(red["a"] - (nproc - 1) / 2) < 1e-6, red
    assert abs(red["b"] - 2.0) < 1e-6, red
    objs = collectives.all_gather({"rank": rank, "blob": "x" * (10 + 7 * rank)})
    assert [o["rank"] for o in objs] == list(range(nproc)), objs
    assert [len(o["blob"]) for o in objs] == [10 + 7 * r for r in range(nproc)]
    g = collectives.gather_on_master(("payload", rank))
    if rank == 0:
        assert g == [("payload", r) for r in range(nproc)], g
    else:
        assert g is None, g
    collectives.synchronize()
    print(f"WORKER {rank} COLLECTIVES OK", flush=True)

    # --- phase 1: real training run (epoch loop, ckpt, per-epoch eval) ---
    from vil_tpu.train.trainer import run_experiment

    cfg = tiny_cfg(outdir)
    cfg.freeze()
    run_experiment(cfg)
    collectives.synchronize()
    import os.path as op

    assert op.isfile(op.join(outdir, "model_best.ckpt"))
    print(f"WORKER {rank} TRAIN OK", flush=True)

    # --- phase 2: EVALUATE on the saved best checkpoint; per-image results
    # are gathered onto the master and deduped across host shards ---
    cfg2 = tiny_cfg(outdir)
    cfg2.EVALUATE = True
    cfg2.MODEL.MODEL_PATH = op.join(outdir, "model_best.ckpt")
    cfg2.freeze()
    accs = run_experiment(cfg2)
    collectives.synchronize()
    assert len(accs) == 1 and 0.0 <= accs[0] <= 100.0
    if rank == 0:
        data = np.load(op.join(outdir, "results_0.npz"))
        n = cfg2.DATALOADER.BSZ * 8  # SyntheticDataset length
        assert sorted(data["indices"].tolist()) == list(range(n)), (
            "per-image results must cover every dataset index exactly once "
            "after the cross-host gather"
        )
        assert data["pred_ids"].shape == (n, 5)
        assert data["scores"].shape == (n, 2)
    print(f"WORKER {rank} DONE", flush=True)


if __name__ == "__main__":
    main()
