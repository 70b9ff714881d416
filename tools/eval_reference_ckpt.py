#!/usr/bin/env python
"""Turnkey eval of a released reference checkpoint (.pth) on ImageNet.

Reproduces the reference's README eval commands (README.md:210-239), e.g.:

    python tools/eval_reference_ckpt.py --ckpt /ckpts/vil_small.pth \
        --model vil_small --data /data/imagenet [--img-size 224] [--bsz 128]

Expected top-1 (reference README.md:211-221): vil_tiny 76.296,
vil_small 81.978. Dataset layout: val.zip + val_map.txt (reference zip
format) or an image-folder val/ directory.
"""
from __future__ import annotations

import argparse
import os.path as op
import sys

sys.path.insert(0, op.dirname(op.dirname(op.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True, help=".pth checkpoint path")
    p.add_argument("--model", default="vil_small",
                   help="zoo name (vil_tiny/vil_small/...) or raw ARCH string")
    p.add_argument("--data", required=True, help="imagenet root")
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--bsz", type=int, default=128)
    p.add_argument("--ln-eps", type=float, default=1e-6)
    p.add_argument("--attn-type", default="longformerhand")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from vil_tpu.utils.compilation_cache import enable

    enable()

    from vil_tpu.config import get_default_cfg
    from vil_tpu.models.arch import ARCH_ZOO
    from vil_tpu.train.trainer import Trainer

    cfg = get_default_cfg()
    cfg.MODEL.VIT.MSVIT.ARCH = ARCH_ZOO.get(args.model, args.model)
    cfg.MODEL.VIT.MSVIT.ATTN_TYPE = args.attn_type
    cfg.MODEL.VIT.MSVIT.LN_EPS = args.ln_eps
    cfg.INPUT.IMAGE_SIZE = args.img_size
    if args.img_size == 384:
        cfg.INPUT.CROP_PCT = 0.922  # README.md:230 + finetune config
    cfg.DATA.PATH = args.data
    cfg.DATALOADER.BSZ = args.bsz
    cfg.DATALOADER.WORKERS = 8
    cfg.EVALUATE = True
    cfg.MODEL.MODEL_PATH = args.ckpt
    cfg.OUTPUT_DIR = ""
    cfg.freeze()

    trainer = Trainer(cfg)
    accs = trainer.fit()
    print(f"top-1: {accs[0]:.3f}")


if __name__ == "__main__":
    main()
