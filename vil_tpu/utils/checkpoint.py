"""Checkpointer (reference /root/reference/src/utils/checkpoint.py).

Functional-state checkpointing with the reference's on-disk conventions:
per-epoch ``checkpoint_{epoch}.ckpt`` (or a single ``checkpoint_last.ckpt``
under ONLY_SAVE_LAST), a ``model_best.ckpt`` copy, and a ``last_checkpoint``
tag file naming the newest checkpoint for auto-resume
(checkpoint.py:162-187, :232-251). Only process 0 writes.

Backends (``backend`` ctor arg / ``CKPT_BACKEND`` config key):
* ``msgpack`` (default): flax msgpack single-file {params, opt_state,
  buffers, step} + a JSON sidecar header {epoch, best_acc, arch}.
* ``orbax``: orbax.checkpoint PyTree directories (``<name>.orbax/``) —
  same tag-file/best-copy/header conventions; supports async-friendly,
  sharding-aware restore on multi-host pods.

Loading also accepts reference ``.pth`` files via the torch importer
(so MODEL.MODEL_PATH works with released checkpoints), and auto-detects
the backend of an existing checkpoint from its on-disk form (file vs
directory), so the two backends can be mixed in one OUTPUT_DIR.
"""
from __future__ import annotations

import json
import logging
import os
import os.path as op
import shutil
from typing import Any, Optional

import jax
from flax import serialization

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, save_dir: str = "", arch: str = "",
                 only_save_last: bool = False, is_test: bool = False,
                 data_dir: str = "", backend: str = "msgpack"):
        self.save_dir = save_dir
        self.arch = arch
        self.only_save_last = only_save_last
        self.is_test = is_test
        self.data_dir = data_dir
        assert backend in ("msgpack", "orbax"), backend
        self.backend = backend
        try:
            self.is_main = jax.process_index() == 0
        except Exception:
            self.is_main = True

    @staticmethod
    def _orbax():
        import orbax.checkpoint as ocp

        return ocp.PyTreeCheckpointer()

    # -- tag file (checkpoint.py:232-251) ------------------------------------
    def _tag_path(self) -> str:
        return op.join(self.save_dir, "last_checkpoint")

    def has_checkpoint(self) -> bool:
        return op.exists(self._tag_path())

    def get_checkpoint_file(self) -> str:
        try:
            with open(self._tag_path(), "r") as f:
                last_saved = f.read().strip()
            # stored relative to save_dir for portability
            if not op.isabs(last_saved):
                last_saved = op.join(self.save_dir, last_saved)
            return last_saved
        except IOError:
            return ""

    def tag_last_checkpoint(self, path: str) -> None:
        with open(self._tag_path(), "w") as f:
            f.write(op.basename(path))

    # -- save -----------------------------------------------------------------
    def save(self, name_or_epoch, state, best_acc: float = 0.0,
             is_best: bool = False, **extra) -> Optional[str]:
        if not self.save_dir or not self.is_main:
            return None
        os.makedirs(self.save_dir, exist_ok=True)
        if isinstance(name_or_epoch, int):
            name = (
                "checkpoint_last"
                if self.only_save_last
                else f"checkpoint_{name_or_epoch}"
            )
            epoch = name_or_epoch
        else:
            name, epoch = name_or_epoch, extra.pop("epoch", 0)
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "buffers": state.buffers,
            "step": state.step,
        }
        if self.backend == "orbax":
            path = op.join(self.save_dir, f"{name}.orbax")
            self._orbax().save(op.abspath(path), payload, force=True)
        else:
            path = op.join(self.save_dir, f"{name}.ckpt")
            with open(path + ".tmp", "wb") as f:
                f.write(serialization.to_bytes(payload))
            os.replace(path + ".tmp", path)
        header = {"arch": self.arch, "epoch": epoch, "best_acc": float(best_acc)}
        header.update(extra)
        with open(path + ".json", "w") as f:
            json.dump(header, f)
        self.tag_last_checkpoint(path)
        if is_best:
            if self.backend == "orbax":
                best = op.join(self.save_dir, "model_best.orbax")
                if op.isdir(best):
                    shutil.rmtree(best)
                shutil.copytree(path, best)
            else:
                best = op.join(self.save_dir, "model_best.ckpt")
                shutil.copyfile(path, best)
            shutil.copyfile(path + ".json", best + ".json")
        logger.info("Saved checkpoint to %s", path)
        return path

    # -- load -----------------------------------------------------------------
    def load(self, state, model_path: str = "", resume: bool = True):
        """Returns (state, header dict). Prefers the last_checkpoint tag over
        model_path (checkpoint.py:199-227); falls back to DATA_DIR join for
        test-time paths (:175-176); imports torch .pth transparently."""
        path = model_path
        if resume and self.has_checkpoint() and not self.is_test:
            path = self.get_checkpoint_file()
        if not path:
            logger.info("No checkpoint found. Initializing model from scratch")
            # save the random init so a crash before the first epoch can
            # still resume deterministically (reference checkpoint.py:206-211)
            if not self.is_test and self.save_dir:
                self.save("model_init", state, epoch=0)
            return state, {}
        if not op.exists(path) and self.data_dir:
            alt = op.join(self.data_dir, path)
            if op.exists(alt):
                path = alt
        if not op.exists(path):
            logger.warning("Checkpoint %s not found; training from scratch", path)
            return state, {}

        if path.endswith(".pth"):
            from .torch_import import load_into_model

            logger.info("Importing torch checkpoint %s", path)
            params = load_into_model(path, state.params)
            return state.replace(params=params), {}

        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "buffers": state.buffers,
            "step": state.step,
        }
        if op.isdir(path):  # orbax directory (backend auto-detected)
            payload = self._orbax().restore(op.abspath(path), item=template)
        else:
            with open(path, "rb") as f:
                payload = serialization.from_bytes(template, f.read())
        header = {}
        if op.isfile(path + ".json"):
            with open(path + ".json", "r") as f:
                header = json.load(f)
        new_state = state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"] if resume else state.opt_state,
            buffers=payload["buffers"],
            step=payload["step"] if resume else state.step,
        )
        logger.info("Loaded checkpoint %s (epoch %s)", path, header.get("epoch"))
        return new_state, header
