#!/usr/bin/env python
"""CLI entry (reference /root/reference/src/run_experiment.py:42-63).

Usage:
    python run_experiment.py --config-file config.yaml \
        [--data DIR] [--output_dir DIR] [--seed N] [KEY VALUE]...

Trailing KEY VALUE pairs are dotted config overrides (yacs-style). On TPU
pods, launch one process per host; ``jax.distributed.initialize`` replaces
torch.distributed.launch (reference :75-82).
"""
from __future__ import annotations

import argparse
import logging
import os


def parse_args():
    parser = argparse.ArgumentParser(description="vil_tpu experiment")
    parser.add_argument("--config-file", default="", metavar="FILE",
                        help="path to config file")
    parser.add_argument("--data", default=os.getenv("PT_DATA_DIR", "./datasets"),
                        help="dataset directory")
    parser.add_argument("--output_dir", default=os.getenv("PT_OUTPUT_DIR", "/tmp"),
                        help="output directory")
    parser.add_argument("--seed", default=42, type=int, help="random seed")
    parser.add_argument("--multi-host", action="store_true",
                        help="call jax.distributed.initialize() for pods")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="dotted config overrides: KEY VALUE ...")
    return parser.parse_args()


def main():
    import os

    if os.environ.get("VIL_TPU_ABLATE"):
        raise SystemExit(
            "VIL_TPU_ABLATE is set — the fused kernels compute wrong numerics "
            "under this timing-only knob; refusing to train/evaluate with it."
        )
    args = parse_args()
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    if args.multi_host:
        import jax

        jax.distributed.initialize()

    from vil_tpu.utils.compilation_cache import enable as enable_cache

    enable_cache()

    from vil_tpu.config import get_default_cfg
    from vil_tpu.train.trainer import run_experiment

    cfg = get_default_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.DATA.PATH = args.data
    cfg.OUTPUT_DIR = args.output_dir
    cfg.TPU.SEED = args.seed
    cfg.freeze()
    return run_experiment(cfg)


if __name__ == "__main__":
    main()
