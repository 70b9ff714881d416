"""Train / eval step functions and epoch loops (reference engine.py).

TPU-first redesign of the reference's eager loops:
* the train step is a single jitted function: forward (bf16), loss, grads,
  optimizer update, and top-1/5 accuracy — XLA inserts the cross-device
  gradient reduction from shardings (no DDP/NCCL wrapper, SURVEY §2.12/2.13);
* the random-shift VIL mode is sampled ON DEVICE from the threaded RNG —
  by default one INDEPENDENT mode per attention layer per step, matching the
  reference's per-forward host sampling (longformer2d.py:116-121);
  ``per_layer_modes=False`` shares one mode across layers;
* metrics come back as a small dict of scalars, aggregated on host.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


class TrainState(struct.PyTreeNode):
    """Functional training state (params + optimizer + model buffers)."""

    step: jax.Array
    params: Any
    opt_state: Any
    buffers: Any  # non-trainable collections (e.g. performer projections)

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.buffers:
            v.update(self.buffers)
        return v


def create_train_state(model, tx, rng: jax.Array, sample_input: jax.Array) -> TrainState:
    variables = model.init({"params": rng}, sample_input)
    params = variables.pop("params")
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        buffers=dict(variables),
    )


def topk_correct(
    logits: jax.Array,
    targets: jax.Array,
    topk=(1, 5),
    target_valid: Optional[np.ndarray] = None,
    overlap_boost: Optional[np.ndarray] = None,
) -> jax.Array:
    """Per-sample top-k correctness (reference compute_accuracy,
    engine.py:14-44), incl. the 22K→1K target-map path: ``target_valid`` is a
    static (num_targets, num_classes) bool matrix, ``overlap_boost`` a static
    bool vector of classes boosted before the top-k (ONLY_OVERLAP_CLASSES)."""
    if overlap_boost is not None:
        boost = (logits.max() - logits.min() + 10) * jnp.asarray(
            overlap_boost, logits.dtype
        )
        logits = logits + boost[None]
    maxk = min(max(topk), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    if target_valid is None:
        correct = pred == targets[:, None]
    else:
        valid = jnp.asarray(target_valid)
        correct = valid[targets][jnp.arange(pred.shape[0])[:, None], pred]
    return jnp.stack(
        [
            jnp.any(correct[:, : min(k, maxk)], axis=1).astype(jnp.float32)
            for k in topk
        ],
        axis=1,
    )  # (B, len(topk))


def sample_vil_modes(rng: jax.Array, depth: int = 0):
    """Random-shift neighbor-block mode(s) in [1, 9).

    depth > 0: one independent mode PER attention layer (the reference
    samples a fresh mode in every attention forward,
    longformer2d.py:116-121). depth == 0: a single shared traced scalar.
    """
    shape = (depth,) if depth > 0 else ()
    return jax.random.randint(rng, shape, 1, 9)


def make_train_step(
    model,
    criterion: Callable,
    tx,
    random_shift: bool = False,
    mixup_fn: Optional[Callable] = None,
    per_layer_modes: bool = True,
) -> Callable:
    """Build the jitted train step.

    random_shift=True samples neighbor-block mode(s) in [1, 9) on device each
    step (the reference's MODE>0 training strategy); the model compiles ONE
    program covering all 8 modes (traced index). By default each attention
    layer draws its own mode (reference per-forward sampling semantics);
    per_layer_modes=False shares one mode across all layers.
    """
    mode_depth = getattr(model, "depth", 0) if per_layer_modes else 0

    def train_step(state: TrainState, images, targets, rng):
        rng_drop, rng_mode, rng_mix = jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        )
        if mixup_fn is not None:
            images, targets = mixup_fn(rng_mix, images, targets)
        mode = sample_vil_modes(rng_mode, mode_depth) if random_shift else 0

        # BatchNorm models (the torchvision-zoo ResNets) update running
        # statistics in-step; under jit with a sharded batch the batch mean
        # is the GLOBAL mean, so this is SyncBatchNorm semantics for free
        has_bn = bool(state.buffers) and "batch_stats" in state.buffers

        def loss_fn(params):
            variables = {"params": params}
            if state.buffers:
                variables.update(state.buffers)
            out = model.apply(
                variables,
                images,
                deterministic=False,
                mode=mode,
                rngs={"dropout": rng_drop},
                mutable=["batch_stats"] if has_bn else False,
            )
            logits, new_model_state = out if has_bn else (out, {})
            return (
                criterion(logits.astype(jnp.float32), targets),
                (logits, new_model_state),
            )

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_buffers = state.buffers
        if has_bn:
            new_buffers = dict(state.buffers)
            new_buffers["batch_stats"] = new_model_state["batch_stats"]
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state,
            buffers=new_buffers,
        )
        metrics = {"loss": loss}
        if targets.ndim == 1:  # hard labels: accuracy is meaningful
            correct = topk_correct(logits.astype(jnp.float32), targets)
            metrics["top1"] = correct[:, 0].mean() * 100
            metrics["top5"] = correct[:, 1].mean() * 100
        return new_state, metrics

    return train_step


def make_eval_step(
    model,
    criterion: Callable,
    target_valid: Optional[np.ndarray] = None,
    overlap_boost: Optional[np.ndarray] = None,
    return_scores: bool = False,
    per_sample_criterion: Optional[Callable] = None,
    pred_topk: int = 0,
) -> Callable:
    """Eval step over a PADDED batch: ``valid`` is a float mask (B,) marking
    real samples (ragged last batches are padded to a device-divisible size
    by the caller). Loss uses the per-sample criterion under masking when
    available; otherwise the batch criterion (exact on full batches).

    ``pred_topk > 0`` additionally returns per-image top-k predicted class
    ids and their logit scores — the per-image results the reference keys by
    image id in results.pth (engine.py:264-268, :323-325)."""

    def eval_step(variables, images, targets, valid):
        logits = model.apply(variables, images, deterministic=True).astype(
            jnp.float32
        )
        n_valid = jnp.maximum(valid.sum(), 1.0)
        if per_sample_criterion is not None:
            loss = jnp.sum(per_sample_criterion(logits, targets) * valid) / n_valid
        else:
            loss = criterion(logits, targets)
        correct = topk_correct(
            logits, targets, (1, 5), target_valid, overlap_boost
        ) * valid[:, None]
        metrics = {
            "loss": loss,
            "top1_sum": correct[:, 0].sum(),
            "top5_sum": correct[:, 1].sum(),
            "count": n_valid,
        }
        if return_scores:
            metrics["scores"] = correct
        if pred_topk > 0:
            k = min(pred_topk, logits.shape[-1])
            pred_scores, pred_ids = jax.lax.top_k(logits, k)
            metrics["pred_ids"] = pred_ids.astype(jnp.int32)
            metrics["pred_scores"] = pred_scores
        return metrics

    return eval_step


def build_target_map_arrays(
    target_map: dict[int, list[int]], num_targets: int, num_classes: int
):
    """Reference validate() target-map preprocessing (engine.py:202-222,
    compute_accuracy:21-25) as static arrays."""
    valid = np.zeros((num_targets, num_classes), dtype=bool)
    overlap = np.zeros((num_classes,), dtype=bool)
    for t, classes in target_map.items():
        for c in classes:
            valid[int(t), int(c)] = True
            overlap[int(c)] = True
    return valid, overlap
