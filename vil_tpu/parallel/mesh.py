"""Device mesh + sharding for SPMD training.

The reference's parallelism is data-parallel DDP over NCCL (SURVEY §2.12:
/root/reference/src/run_experiment.py:146-152, utils/comm.py). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with the batch sharded over the 'data'
axis and parameters replicated: XLA inserts the gradient all-reduce over ICI
from the shardings — there is no DDP wrapper, no bucketing, no hand-written
collectives. Multi-host (DCN) initialization maps to
``jax.distributed.initialize``.

``MESH_SHAPE``/``MESH_AXES`` in the config allow extending to >1 axes (e.g.
('data', 'model') for fsdp-style sharding of the larger MsViT variants).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; a -1 dim absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    shape = list(mesh_shape)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    if -1 in shape:
        shape[shape.index(-1)] = len(devices) // max(known, 1)
    n = int(np.prod(shape))
    if n != len(devices):
        devices = devices[:n]
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def mesh_from_cfg(cfg, devices=None) -> Mesh:
    return create_mesh(tuple(cfg.TPU.MESH_SHAPE), tuple(cfg.TPU.MESH_AXES), devices)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data",
                sharding: Optional[NamedSharding] = None) -> Any:
    """Place host arrays on the mesh, batch-dim sharded (or with an explicit
    ``sharding`` — e.g. the image sharding on a data×spatial mesh).

    Multi-host: each process passes its PER-HOST batch shard (the loaders
    already shard by process, reference DistributedSampler semantics) and
    the global array is assembled host-locally — no cross-host data copies
    (``make_array_from_process_local_data`` over DCN-free local devices)."""
    if sharding is None:
        sharding = batch_sharding(mesh, axis)
    if mesh.devices.size > len([d for d in mesh.devices.flat if d.process_index == jax.process_index()]):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def fsdp_sharding(mesh: Mesh, tree: Any, axis: str = "data",
                  min_size: int = 2**14) -> Any:
    """Per-leaf NamedSharding tree: shard the largest divisible dimension of
    each big parameter over ``axis`` (ZeRO-3/fsdp-style). Small leaves stay
    replicated. XLA inserts the all-gathers at use sites and reduce-scatters
    for the gradients — no hand-written collectives.
    """
    n = mesh.shape[axis]

    def _shard(x):
        shape = getattr(x, "shape", ())
        if not shape or int(np.prod(shape)) < min_size:
            return replicated(mesh)
        # largest dimension divisible by the axis size
        cands = [(d, i) for i, d in enumerate(shape) if d % n == 0]
        if not cands:
            return replicated(mesh)
        _, dim = max(cands)
        spec = [None] * len(shape)
        spec[dim] = axis
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(_shard, tree)


def shard_like(tree: Any, shardings: Any) -> Any:
    """device_put each leaf with its sharding from a matching tree."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def jit_train_step(train_step, mesh: Mesh, axis: str = "data", donate_state=True,
                   state_shardings=None):
    """jit the train step with batch-sharded inputs.

    State is replicated by default; pass ``state_shardings`` (e.g. built from
    :func:`fsdp_sharding` over the TrainState) to shard parameters/optimizer
    state instead. Gradients are averaged across devices implicitly: the loss
    is a global batch mean, so XLA emits the psum over ICI (replacing DDP's
    bucketed all-reduce, reference comm.py / engine.py:97-98).
    """
    state_s = state_shardings if state_shardings is not None else replicated(mesh)
    data_s = batch_sharding(mesh, axis)
    return jax.jit(
        train_step,
        in_shardings=(state_s, image_sharding(mesh, axis), data_s,
                      replicated(mesh)),
        out_shardings=(state_s, replicated(mesh)),
        donate_argnums=(0,) if donate_state else (),
    )


def image_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Input-image sharding for the jitted steps: when the mesh declares a
    'spatial' axis (``TPU.MESH_AXES ['data','spatial']``), the NHWC image
    HEIGHT is sharded over it — whole-model SPATIAL parallelism straight
    from the CLI config. GSPMD threads the height split through patch
    embeds and the sliding-chunk attention (cyclic rolls lower to
    collective permutes over ICI; certified exact in tests/test_spatial.py).
    Otherwise just the batch axis."""
    if "spatial" in mesh.shape:
        return NamedSharding(mesh, P(axis, "spatial"))
    return batch_sharding(mesh, axis)


def lockstep_compile(jitted):
    """Compile-skew barrier for multi-host runs.

    Collective contexts are created lazily at FIRST execution of a program,
    with a rendezvous deadline (XLA's gloo KV store: 30 s; ICI setup has
    similar limits) — but per-host compile times for the same program can
    differ by minutes on loaded hosts, so the fastest host can reach the
    rendezvous and time out while a peer is still compiling. Wrap a jitted
    step so that each distinct input signature is AOT-compiled first and a
    cross-host barrier runs BEFORE the first execution; the barrier's own
    program is trivial (negligible skew). Single-process: returns ``jitted``
    unchanged.
    """
    if jax.process_count() == 1:
        return jitted

    compiled = {}

    def wrapped(*args):
        key = tuple(
            (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else None
            for leaf in args
            for x in jax.tree_util.tree_leaves(leaf)
        )
        if key not in compiled:
            from . import collectives

            compiled[key] = jitted.lower(*args).compile()
            collectives.synchronize()
        return compiled[key](*args)

    return wrapped


def jit_eval_step(eval_step, mesh: Mesh, axis: str = "data",
                  variables_shardings=None):
    """Jit the eval step: scalar metrics replicated; per-sample outputs
    (``scores``) stay batch-sharded on their devices — replicating them
    would all-gather every per-image row to every host (reference
    GATHER_ON_CPU pain point, comm.py:90-140); hosts read back only their
    addressable shards (trainer ``_host_rows``).

    ``variables_shardings``: a sharding tree matching the model-variables
    dict so tp/fsdp runs keep their param shardings at eval time instead of
    all-gathering the whole model to every chip (the HBM regime those modes
    exist to avoid)."""
    state_s = (
        variables_shardings if variables_shardings is not None
        else replicated(mesh)
    )
    data_s = batch_sharding(mesh, axis)
    img_s = image_sharding(mesh, axis)

    def wrapped(variables, images, targets, valid):
        m = eval_step(variables, images, targets, valid)
        per_sample = [k for k in ("scores", "pred_ids", "pred_scores") if k in m]
        if per_sample:
            m = dict(m)
            for k in per_sample:
                m[k] = jax.lax.with_sharding_constraint(m[k], data_s)
        return m

    return jax.jit(
        wrapped,
        in_shardings=(state_s, img_s, data_s, data_s),
        out_shardings=None,
    )


def spatial_image_sharding(mesh: Mesh, data_axis: str = "data",
                           spatial_axis: str = "spatial") -> NamedSharding:
    """Sharding for an NHWC image batch with HEIGHT split over the spatial
    axis (and batch over the data axis) — the input layout of huge-image
    spatial inference."""
    axes = dict(mesh.shape)
    data = data_axis if data_axis in axes else None
    return NamedSharding(mesh, P(data, spatial_axis))


def shard_image(mesh: Mesh, x: Any, data_axis: str = "data",
                spatial_axis: str = "spatial") -> Any:
    """Place an NHWC image batch with height sharded over ``spatial_axis``
    (batch over ``data_axis`` when the mesh has one)."""
    return jax.device_put(x, spatial_image_sharding(mesh, data_axis,
                                                    spatial_axis))


def jit_spatial_forward(model, mesh: Mesh, data_axis: str = "data",
                        spatial_axis: str = "spatial"):
    """Whole-model SPATIALLY-PARALLEL forward: one image's computation runs
    across every chip on the ``spatial_axis`` (beyond-reference capability —
    the reference's only parallelism is batch DDP,
    /root/reference/src/run_experiment.py:146-152).

    The input image is sharded over its HEIGHT dim (``shard_image``) and
    params are replicated; GSPMD propagates the height sharding through the
    patch-embed convs, the persistent chunked stage layout (the chunk-row
    axis mx inherits the height split), and the sliding-chunk attention —
    whose cyclic neighbor rolls lower to collective-permutes of one chunk
    row over ICI, the same halo exchange parallel/spatial.py hand-writes at
    op level (certified equal in tests/test_spatial.py). Use this when one
    chip cannot hold a stage's activations (1024²+ inputs); for op-level
    control (Pallas halo kernels) see parallel/spatial.py.

    Returns a jitted ``fn(variables, x) -> logits`` with logits sharded over
    ``data_axis``.
    """
    xs = spatial_image_sharding(mesh, data_axis, spatial_axis)
    rep = replicated(mesh)
    axes = dict(mesh.shape)
    out = NamedSharding(mesh, P(data_axis if data_axis in axes else None))

    def forward(variables, x):
        return model.apply(variables, x, deterministic=True)

    return jax.jit(forward, in_shardings=(rep, xs), out_shardings=out)


def pad_batch(arrs, multiple: int):
    """Zero-pad leading dims to a multiple (ragged final eval batches);
    returns (padded arrays..., valid float mask)."""
    b = arrs[0].shape[0]
    target = -(-b // multiple) * multiple
    pad = target - b
    valid = np.ones((target,), dtype=np.float32)
    if pad:
        valid[b:] = 0.0
        arrs = [
            np.concatenate(
                [a, np.zeros((pad,) + a.shape[1:], dtype=a.dtype)], axis=0
            )
            for a in (np.asarray(a) for a in arrs)
        ]
    return list(arrs), valid
