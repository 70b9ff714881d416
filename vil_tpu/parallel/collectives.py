"""Cross-host communication helpers (reference /root/reference/src/utils/comm.py).

The reference wraps torch.distributed: pickle-based ``all_gather`` of
arbitrary objects (comm.py:47-87), CPU ``gather_on_master`` (:90-140),
``reduce_dict`` (:143-169), and rank helpers. TPU-native equivalents:

* rank helpers map to ``jax.process_index/process_count``;
* metric reduction happens ON DEVICE inside the jitted step (psum from
  shardings) — ``reduce_dict`` survives for host-side dicts of scalars;
* eval-result accumulation maps to
  ``jax.experimental.multihost_utils.process_allgather`` for arrays and a
  broadcast-based object gather for python objects.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (reference comm.py:32-44)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vil_tpu_barrier")


def all_gather_arrays(array: np.ndarray) -> np.ndarray:
    """Gather a per-host array onto every host (stacked on a new axis)."""
    if get_world_size() == 1:
        return np.asarray(array)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(array)))


def all_gather(data: Any) -> list:
    """Gather arbitrary picklable objects from all hosts
    (reference comm.py:47-87: pickle → padded byte tensors → all_gather)."""
    world = get_world_size()
    if world == 1:
        return [data]
    buf = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = all_gather_arrays(np.asarray([buf.size], dtype=np.int64))[:, 0]
    max_size = int(sizes.max())
    padded = np.zeros((max_size,), dtype=np.uint8)
    padded[: buf.size] = buf
    gathered = all_gather_arrays(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world)
    ]


def gather_on_master(data: Any) -> list | None:
    """Gather objects on host 0 only (reference comm.py:90-140). On TPU the
    transport is the same collective; non-master hosts drop the result."""
    out = all_gather(data)
    return out if is_main_process() else None


def reduce_dict(input_dict: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Sum (or mean) a dict of scalars across hosts (reference comm.py:143-169)."""
    world = get_world_size()
    if world == 1:
        return dict(input_dict)
    keys = sorted(input_dict)
    vals = np.asarray([float(input_dict[k]) for k in keys], dtype=np.float64)
    gathered = all_gather_arrays(vals).sum(axis=0)
    if average:
        gathered = gathered / world
    return dict(zip(keys, gathered.tolist()))


def accumulate_predictions(predictions_per_host: dict) -> dict:
    """Merge per-image prediction dicts from all hosts on host 0
    (reference comm.py:172-184). Returns {} on non-master hosts."""
    gathered = gather_on_master(predictions_per_host)
    if gathered is None:
        return {}
    merged: dict = {}
    for d in gathered:
        merged.update(d)
    return merged
