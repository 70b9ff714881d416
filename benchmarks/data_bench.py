#!/usr/bin/env python
"""Input-pipeline throughput benchmark: decoded+augmented images/sec.

The reference trains through its loader on real data
(/root/reference/src/dat/loader.py:131, src/engine.py:70); every vil_tpu
throughput number so far fed synthetic on-device arrays. This harness
measures the host-side pipeline at rate on BOTH backends:

  - thread DataLoader   (vil_tpu/data/loader.py — PIL decode releases the GIL)
  - Grain DataLoader    (vil_tpu/data/grain_loader.py — worker PROCESSES)

over a synthetic ZIP dataset and a synthetic TSV dataset (generated once in
--root, reused across runs), at WORKERS in {4, 8, 16} plus a 0-worker
single-thread floor, for the default train augmentation and (optionally)
the timm RandAugment pipeline.

The numbers scale with host cores: the script prints cores visible and the
per-core rate, and extrapolates the cores needed to feed a target chip rate
(default 6813 img/s, the r3 single-chip inference headline). Results →
docs/BENCHMARKS.md ("Input pipeline" section).

Usage:
  python benchmarks/data_bench.py [--root /tmp/vil_data_bench]
      [--images 1024] [--img-size 256] [--batch 64]
      [--workers 0 4 8 16] [--timm] [--target 6813]
"""
from __future__ import annotations

import argparse
import base64
import io
import os
import os.path as op
import time
import zipfile

import numpy as np


# ---------------------------------------------------------------------------
# synthetic dataset generation (once per --root; JPEG-compressed random
# crops so the decode cost is realistic, ~25-60 KB each at q=85)
# ---------------------------------------------------------------------------
def _random_jpeg_bytes(rng, size: int) -> bytes:
    from PIL import Image

    # smooth low-frequency content compresses/decodes like a natural image;
    # pure noise JPEGs are unrealistically slow to decode
    small = rng.integers(0, 256, (size // 8, size // 8, 3), dtype=np.uint8)
    img = Image.fromarray(small).resize((size, size), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def generate_zip(root: str, n: int, size: int, num_classes: int = 100):
    zpath, mpath = op.join(root, "train.zip"), op.join(root, "train_map.txt")
    if op.exists(zpath) and op.exists(mpath):
        return zpath, mpath
    rng = np.random.default_rng(0)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf, \
            open(mpath, "w") as mf:
        for i in range(n):
            fname = f"img_{i:06d}.jpg"
            zf.writestr(fname, _random_jpeg_bytes(rng, size))
            mf.write(f"x@{fname}\t{i % num_classes}\n")
    return zpath, mpath


def generate_tsv(root: str, n: int, size: int, num_classes: int = 100):
    tpath = op.join(root, "train.tsv")
    if op.exists(tpath):
        return tpath
    rng = np.random.default_rng(1)
    with open(tpath, "w") as f:
        for i in range(n):
            b64 = base64.b64encode(_random_jpeg_bytes(rng, size)).decode()
            f.write(f"key{i}\t{i % num_classes}\t{b64}\n")
    return tpath


# ---------------------------------------------------------------------------
# measurement
# ---------------------------------------------------------------------------
def build_train_transforms(img_size: int, timm: bool):
    from vil_tpu.config import get_default_cfg
    from vil_tpu.data.transforms import build_transforms

    cfg = get_default_cfg()
    cfg.merge_from_list(["INPUT.IMAGE_SIZE", str(img_size)])
    if timm:
        cfg.AUG.TIMM_AUG.USE_TRANSFORM = True
        cfg.AUG.TIMM_AUG.AUTO_AUGMENT = "rand-m9-mstd0.5-inc1"
        cfg.AUG.TIMM_AUG.RE_PROB = 0.25
    return build_transforms(cfg, is_train=True)


def run_loader(loader, max_batches: int | None = None):
    """One pass; returns (steady-state images, seconds, startup seconds).
    The timed window opens at the FIRST batch: pipeline startup (grain
    worker-process spawn ≈ seconds of interpreter+imports per worker; thread
    pool spin-up) is reported separately — it amortizes over a real epoch
    (1.28M images) but would dominate a small synthetic pass. Touches each
    batch so lazy backends can't defer work past the timer."""
    n, t_start = 0, time.time()
    t0 = None
    for i, (imgs, targets) in enumerate(loader):
        if t0 is None:
            t0 = time.time()  # first batch delivered: steady state begins
        else:
            n += imgs.shape[0]
        _ = imgs.dtype  # materialized by np.stack/np.asarray already
        if max_batches is not None and i + 1 >= max_batches:
            break
    return n, time.time() - t0, t0 - t_start


def measure(dataset, batch: int, workers: int, backend: str) -> float:
    from vil_tpu.data.loader import DataLoader
    from vil_tpu.data.samplers import make_data_sampler

    sampler = make_data_sampler(
        len(dataset), shuffle=True, distributed=False, is_train=True,
        repeated_aug=False, num_replicas=1, rank=0, seed=0,
    )
    if backend == "grain":
        from vil_tpu.data.grain_loader import GrainDataLoader

        loader = GrainDataLoader(dataset, sampler, batch, drop_last=True,
                                 num_workers=workers)
    else:
        loader = DataLoader(dataset, sampler, batch, drop_last=True,
                            num_workers=workers)
    # warm one pass (page cache, worker spin-up), measure the second
    run_loader(loader)
    n, dt, startup = run_loader(loader)
    return n / dt, startup


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vil_data_bench")
    ap.add_argument("--images", type=int, default=1024)
    ap.add_argument("--img-size", type=int, default=256,
                    help="stored JPEG side (decode cost driver)")
    ap.add_argument("--train-size", type=int, default=224,
                    help="augmented output side")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 4, 8, 16])
    ap.add_argument("--timm", action="store_true",
                    help="also run the timm RandAugment pipeline")
    ap.add_argument("--target", type=float, default=6813.0,
                    help="chip consumption rate to extrapolate against")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    print(f"host cores visible: {os.cpu_count()} "
          f"(affinity: {len(os.sched_getaffinity(0))})")
    zpath, mpath = generate_zip(args.root, args.images, args.img_size)
    tpath = generate_tsv(args.root, args.images, args.img_size)

    from vil_tpu.data.datasets import ZipData
    from vil_tpu.data.tsv import ClsTsvDataset

    pipelines = [("default-aug", build_train_transforms(args.train_size, False))]
    if args.timm:
        pipelines.append(("timm-randaug",
                          build_train_transforms(args.train_size, True)))
    # decode-only floor: isolates JPEG decode + RGB convert from augmentation
    pipelines.append(("decode-only", None))

    best = {}
    for aug_name, tf in pipelines:
        for ds_name, make in (
            ("zip", lambda t: ZipData(zpath, mpath, transforms=t)),
            ("tsv", lambda t: ClsTsvDataset(tpath, transforms=t)),
        ):
            ds = make(tf)
            for backend in ("threads", "grain"):
                for w in args.workers:
                    if backend == "grain" and w == 0:
                        continue  # grain w=0 == in-process, same as threads w=0
                    try:
                        rate, startup = measure(ds, args.batch, w, backend)
                    except Exception as e:
                        print(f"{aug_name:13s} {ds_name} {backend:8s} "
                              f"w={w:2d}: FAILED {e!r}")
                        continue
                    key = (aug_name, backend)
                    best[key] = max(best.get(key, 0.0), rate)
                    print(f"{aug_name:13s} {ds_name} {backend:8s} w={w:2d}: "
                          f"{rate:8.1f} img/s steady "
                          f"(+{startup:.1f}s startup)", flush=True)

    cores = len(os.sched_getaffinity(0))
    print("\n-- summary (best over datasets/workers) --")
    for (aug_name, backend), rate in sorted(best.items()):
        per_core = rate / cores
        need = args.target / per_core if per_core > 0 else float("inf")
        print(f"{aug_name:13s} {backend:8s}: {rate:8.1f} img/s "
              f"({per_core:.1f}/core; ~{need:.0f} cores to feed "
              f"{args.target:.0f} img/s)")


if __name__ == "__main__":
    main()
