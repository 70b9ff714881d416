"""Performer projection redraw (reference msvit.py:517-530 +
run_experiment.py:217-221).

The reference mutates a registered buffer every ``feature_redraw_interval``
train forwards with interval ``1 + 5·epoch``. Functionally: the projections
live in the TrainState's ``buffers`` collection; the train loop calls
``redraw_projections`` on that schedule and threads the new buffers in.
"""
from __future__ import annotations

from typing import Any

import jax

from ..models.attention_efficient import gaussian_orthogonal_random_matrix


def redraw_projections(buffers: Any, rng: jax.Array) -> Any:
    """Resample every 'projection_matrix' leaf with fresh orthogonal
    random features."""
    flat = jax.tree_util.tree_flatten_with_path(buffers)[0]
    keys = jax.random.split(rng, max(len(flat), 1))
    replacements = {}
    for (path, leaf), key in zip(flat, keys):
        names = [str(p.key) for p in path if hasattr(p, "key")]
        if names and names[-1] == "projection_matrix":
            replacements[path] = gaussian_orthogonal_random_matrix(
                key, leaf.shape[0], leaf.shape[1]
            ).astype(leaf.dtype)
    if not replacements:
        return buffers

    def _replace(path, leaf):
        return replacements.get(path, leaf)

    return jax.tree_util.tree_map_with_path(_replace, buffers)


class RedrawSchedule:
    """feature_redraw_interval = 1 + 5·epoch; redraw when calls exceed it
    (reference run_experiment.py:217-221 + msvit.py:517-530)."""

    def __init__(self):
        self.interval = 1
        self.calls_since_last = 0

    def set_epoch(self, epoch: int):
        self.interval = 1 + 5 * epoch

    def should_redraw(self) -> bool:
        if self.calls_since_last >= self.interval:
            self.calls_since_last = 0
            return True
        self.calls_since_last += 1
        return False
