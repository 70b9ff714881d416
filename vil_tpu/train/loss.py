"""Loss zoo (reference /root/reference/src/loss.py).

All criteria are pure functions ``(logits, targets) -> scalar`` suitable for
jit/grad. ``get_criterion`` reproduces the reference dispatch
(loss.py:118-142), including the mixup rule: soft-target CE for training and
plain CE for eval when MIXUP_PROB > 0.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Criterion = Callable[[jax.Array, jax.Array], jax.Array]


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE with integer labels (torch nn.CrossEntropyLoss)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[:, None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def label_smoothing_cross_entropy(
    logits: jax.Array, targets: jax.Array, epsilon: float = 0.1
) -> jax.Array:
    """ε·uniform + (1-ε)·nll (loss.py:17-28)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    uniform = jnp.mean(-jnp.sum(logp, axis=-1)) / n
    nll = cross_entropy(logits, targets)
    return epsilon * uniform + (1.0 - epsilon) * nll


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Soft-target CE for mixup (loss.py:109-115); targets are distributions."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.mean(jnp.sum(-targets * logp, axis=-1))


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary CE with logits (numerically stable)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 1.0,
    gamma: float = 0.5,
    normalize: bool = True,
) -> jax.Array:
    """Class-balanced focal loss (loss.py:31-60); targets are multi-hot."""
    ce = _bce_with_logits(logits, targets)
    if gamma == 0.0:
        modulator = 1.0
    else:
        modulator = jnp.exp(
            -gamma * targets * logits - gamma * jnp.log1p(jnp.exp(-logits))
        )
    loss = alpha * modulator * ce
    total = jnp.sum(loss)
    if normalize:
        return total / jnp.sum(targets)
    return total


def multi_softmax_cross_entropy(
    logits: jax.Array, soft_targets: jax.Array, label_smoothing: float = 0.0
) -> jax.Array:
    """Multi-label softmax CE (loss.py:63-106), vectorized label smoothing."""
    if label_smoothing > 0.0:
        n = soft_targets.shape[-1]
        pos = (soft_targets > 0).astype(soft_targets.dtype)
        pos_count = jnp.sum(pos, axis=-1, keepdims=True)
        neg_p = label_smoothing / (n - pos_count)
        pos_p = label_smoothing / jnp.maximum(pos_count, 1)
        soft_targets = jnp.where(
            pos > 0, soft_targets - pos_p, soft_targets + neg_p
        )
        soft_targets = jnp.where(pos_count > 0, soft_targets, soft_targets * 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return jnp.sum(-soft_targets * logp) / jnp.sum(soft_targets)


def multilabel_soft_margin(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """torch nn.MultiLabelSoftMarginLoss(reduction='sum')."""
    per_class = targets * jax.nn.log_sigmoid(logits) + (1 - targets) * jax.nn.log_sigmoid(-logits)
    per_sample = -jnp.mean(per_class, axis=-1)
    return jnp.sum(per_sample)


def bce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(_bce_with_logits(logits, targets))


def mse(preds: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(preds - targets))


def cross_entropy_per_sample(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(
        logp, targets[:, None].astype(jnp.int32), axis=-1
    )[:, 0]


def label_smoothing_per_sample(
    logits: jax.Array, targets: jax.Array, epsilon: float = 0.1
) -> jax.Array:
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    uniform = -jnp.sum(logp, axis=-1) / n
    nll = cross_entropy_per_sample(logits, targets)
    return epsilon * uniform + (1.0 - epsilon) * nll


def get_per_sample_criterion(cfg):
    """Per-sample eval loss (for masked/padded eval batches). Returns None
    for losses without a per-sample decomposition (focal and multisoftmax
    normalize over the whole batch — their padded-eval loss carries a small
    pad-row bias; accuracy metrics are always exactly masked)."""
    name = cfg.LOSS.LOSS
    if name == "xentropy":
        if cfg.AUG.MIXUP_PROB > 0.0 or cfg.LOSS.LABEL_SMOOTHING <= 0.0:
            return cross_entropy_per_sample
        eps = cfg.LOSS.LABEL_SMOOTHING
        return lambda lo, t: label_smoothing_per_sample(lo, t, eps)
    if name == "sigmoid":
        return lambda lo, t: -jnp.mean(
            t * jax.nn.log_sigmoid(lo) + (1 - t) * jax.nn.log_sigmoid(-lo),
            axis=-1,
        )
    if name == "bce":
        return lambda lo, t: jnp.mean(_bce_with_logits(lo, t), axis=-1)
    if name == "mse":
        return lambda lo, t: jnp.mean(jnp.square(lo - t), axis=-1)
    return None


def get_criterion(cfg, train: bool = True) -> Criterion:
    """Reference dispatch (loss.py:118-142)."""
    name = cfg.LOSS.LOSS
    if cfg.AUG.MIXUP_PROB > 0.0 and name == "xentropy":
        return soft_target_cross_entropy if train else cross_entropy
    if cfg.LOSS.LABEL_SMOOTHING > 0.0 and name == "xentropy":
        eps = cfg.LOSS.LABEL_SMOOTHING
        return lambda lo, t: label_smoothing_cross_entropy(lo, t, eps)
    if name == "xentropy":
        return cross_entropy
    if name == "sigmoid":
        return multilabel_soft_margin
    if name == "focal":
        a, g, n = cfg.LOSS.FOCAL.ALPHA, cfg.LOSS.FOCAL.GAMMA, cfg.LOSS.FOCAL.NORMALIZE
        return lambda lo, t: focal_loss(lo, t, a, g, n)
    if name == "multisoftmax":
        return multi_softmax_cross_entropy
    if name == "bce":
        return bce
    if name == "mse":
        return mse
    raise ValueError(f"Unknown loss {name}")
