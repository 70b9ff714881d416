"""Tensor (model) parallelism: Megatron-style sharding of the transformer.

The reference has no intra-layer model parallelism at all — its only
parallelism is batch DDP over NCCL (/root/reference/src/run_experiment.py:146-152,
utils/comm.py). On TPU, tensor parallelism is pure sharding annotation:
shard the column-parallel weights (QKV / MLP-up projections) over their
OUTPUT feature dim and the row-parallel weights (attention-out / MLP-down)
over their INPUT feature dim on a 'model' mesh axis, and GSPMD inserts the
single all-reduce per block (after proj / fc2) over ICI — the classic
Megatron-LM cut, with zero hand-written collectives.

Attention stays exact: per-head score/context contractions only touch the
head axis, which lives inside the column-sharded feature dim, so each chip
computes its local heads end-to-end and only the output projection's
partial sums are reduced.

Used for the wide MsViT variants where one chip's HBM cannot hold the
activations+params at a useful batch size, and composes with the 'data'
axis (dp×tp) — see ``tp_sharding`` + ``mesh.jit_train_step``.

Caveat: GSPMD cannot partition a Pallas custom call, so with
``TPU.USE_PALLAS`` the fused attention kernels' operands are gathered to
each chip and the kernel itself runs replicated (every GEMM around it —
QKV, proj, MLPs, i.e. where the params are — still runs split). Splitting
the kernels themselves over heads needs a shard_map wrapper like the
spatial path's (parallel/spatial.py); with the pure-XLA attention tier
the whole block partitions. Correct either way — certified ≡ replicated
in tests/test_distributed.py.
"""
from __future__ import annotations

import logging
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# Dense modules whose OUTPUT features are sharded (column parallel): the
# QKV projections (heads split across chips) and the MLP up-projection.
COLUMN_PARALLEL = ("qkv", "query", "kv", "fc1")
# Dense modules whose INPUT features are sharded (row parallel): their
# outputs are partial sums that GSPMD all-reduces once per block.
ROW_PARALLEL = ("proj", "proj_global", "fc2")
# Packed projections: the output dim concatenates q/k/v (or k/v) blocks.
# Splitting must not cross block boundaries, so divisibility is checked on
# the PER-BLOCK width, not the packed output dim.
_PACK_FACTOR = {"qkv": 3, "kv": 2}


def _key_name(entry) -> str:
    for attr in ("key", "name"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _tp_spec(path, leaf, n: int) -> P:
    """PartitionSpec for one parameter (or mirrored optimizer moment).

    Falls back to replicated — with a warning — when the shape does not
    divide cleanly: a silent fallback would leave the advertised Megatron
    cut half-applied (e.g. kernel replicated but bias sharded) with only
    extra GSPMD resharding collectives as evidence."""
    shape = getattr(leaf, "shape", ())
    names = [_key_name(e) for e in path]
    leaf_name = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    pack = _PACK_FACTOR.get(parent, 1)

    def divisible(dim: int, pack: int = 1) -> bool:
        # packed projections must split per-block (q/k/v separately), not
        # across the concatenated output dim
        return (
            len(shape) > dim
            and shape[dim] % pack == 0
            and (shape[dim] // pack) % n == 0
        )

    def fallback(dim: int, pack: int = 1) -> P:
        logger.warning(
            "tp: %s stays REPLICATED — dim %d of %s (pack %d) does not "
            "divide by the model axis (%d); the Megatron cut is not applied "
            "to this leaf", "/".join(names), dim, shape, pack, n,
        )
        return P()

    if parent in COLUMN_PARALLEL:
        # flax Dense kernel is (in_features, out_features); 2-D guard keeps
        # the rule off same-named convs (e.g. PatchEmbed's 'proj' Conv).
        if leaf_name == "kernel" and len(shape) == 2:
            return P(None, "model") if divisible(1, pack) else fallback(1, pack)
        if leaf_name == "bias" and len(shape) == 1:
            return P("model") if divisible(0, pack) else fallback(0, pack)
    if parent in ROW_PARALLEL:
        if leaf_name == "kernel" and len(shape) == 2:
            return P("model", None) if divisible(0) else fallback(0)
        # row-parallel bias stays replicated: it is added AFTER the
        # partial-sum all-reduce.
    return P()


def tp_sharding(mesh: Mesh, tree: Any, axis: str = "model") -> Any:
    """Per-leaf NamedSharding tree with Megatron tensor-parallel specs.

    Works on a bare param dict or a whole TrainState: optimizer moments
    mirror the param tree structure, so path-name matching shards them
    identically (adamw's m/v split the same way as their parameters).
    Leaves whose shapes don't divide by the axis size stay replicated.
    """
    n = mesh.shape[axis]

    def to_sharding(path, leaf):
        spec = _tp_spec(path, leaf, n)
        if axis != "model" and spec != P():
            spec = P(*[axis if a == "model" else a for a in spec])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, tree)
