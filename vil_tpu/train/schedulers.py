"""LR schedules (reference /root/reference/src/optim/lr_scheduler.py).

Pure ``step -> lr`` functions (optax schedules), reproducing the reference's
exact warmup/decay formulas so training curves match:

* warmup factor: wf·(1-α) + α with α = step/warmup_iters (linear) or wf
  (constant) while step < warmup_iters
* multistep:     lr·warmup·γ^bisect(milestones, step)
* cosine:        min + (lr-min)·(1+cos(π·step/max_iter))/2 after warmup
                 (note: the cosine phase uses the RAW step, warmup included —
                 lr_scheduler.py:92-96)
* linear:        min + (lr-min)·max(0, (max_iter-step)/(max_iter-warmup))
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def _warmup_factor(step, warmup_iters: float, warmup_factor: float, method: str):
    if method not in ("constant", "linear"):
        raise ValueError(f"Only 'constant' or 'linear' warmup accepted, got {method}")
    if method == "constant":
        return jnp.asarray(warmup_factor, jnp.float32)
    alpha = step / jnp.maximum(warmup_iters, 1)
    return warmup_factor * (1 - alpha) + alpha


def warmup_multistep(
    base_lr: float,
    milestones: Sequence[int],
    gamma: float,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: float = 500,
    warmup_method: str = "linear",
) -> Schedule:
    milestones = jnp.asarray(sorted(milestones), jnp.int32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        wf = jnp.where(
            step < warmup_iters,
            _warmup_factor(step, warmup_iters, warmup_factor, warmup_method),
            1.0,
        )
        power = jnp.sum(step >= milestones.astype(jnp.float32))
        return base_lr * wf * gamma ** power

    return schedule


def warmup_cosine(
    base_lr: float,
    max_iter: int,
    min_lr: float = 0.0,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: float = 500,
    warmup_method: str = "linear",
) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * _warmup_factor(
            step, warmup_iters, warmup_factor, warmup_method
        )
        cos = min_lr + (base_lr - min_lr) * (
            1 + jnp.cos(jnp.pi * step / max_iter)
        ) / 2
        return jnp.where(step < warmup_iters, warm, cos)

    return schedule


def warmup_linear(
    base_lr: float,
    max_iter: int,
    min_lr: float = 0.0,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: float = 500,
    warmup_method: str = "linear",
) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * _warmup_factor(
            step, warmup_iters, warmup_factor, warmup_method
        )
        rate = jnp.maximum(
            0.0, (max_iter - step) / jnp.maximum(1.0, max_iter - warmup_iters)
        )
        return jnp.where(step < warmup_iters, warm, min_lr + rate * (base_lr - min_lr))

    return schedule


def get_lr_schedule(cfg, last_iter: int = 0) -> Schedule | None:
    """Reference factory (optim/__init__.py:67-120). Returns None (constant
    LR) for unknown policies, matching the reference's warning-and-None."""
    lr_policy = cfg.SOLVER.LR_POLICY
    epoch_based = cfg.SOLVER.EPOCH_BASED_SCHEDULE
    if epoch_based:
        warmup_iters = cfg.SOLVER.WARMUP_EPOCHS
        max_iters = int(cfg.OPTIM.EPOCHS)
    else:
        warmup_iters = int(cfg.SOLVER.WARMUP_EPOCHS * cfg.SOLVER.STEPS_PER_EPOCH)
        max_iters = cfg.SOLVER.MAX_ITER
    common = dict(
        warmup_factor=cfg.SOLVER.WARMUP_FACTOR,
        warmup_iters=warmup_iters,
        warmup_method=cfg.SOLVER.WARMUP_METHOD,
    )
    def _units(schedule):
        """Schedules are always evaluated with the optimizer STEP count; an
        epoch-based schedule advances once per epoch (the reference steps it
        per epoch, engine.py:169-170) — convert steps → whole epochs."""
        if not epoch_based:
            return schedule
        spe = max(int(cfg.SOLVER.STEPS_PER_EPOCH), 1)
        return lambda step: schedule(jnp.asarray(step) // spe)

    if lr_policy == "multistep":
        if epoch_based:
            steps = tuple(
                range(cfg.OPTIM.DROP_FREQ, cfg.OPTIM.EPOCHS, cfg.OPTIM.DROP_FREQ)
            )
        else:
            steps = tuple(
                e * cfg.SOLVER.STEPS_PER_EPOCH
                for e in range(cfg.OPTIM.DROP_FREQ, cfg.OPTIM.EPOCHS, cfg.OPTIM.DROP_FREQ)
            )
        return _units(warmup_multistep(
            cfg.OPTIM.LR, steps, 1.0 / cfg.OPTIM.DROP_FACTOR, **common
        ))
    if lr_policy == "cosine":
        return _units(
            warmup_cosine(cfg.OPTIM.LR, max_iters, cfg.SOLVER.MIN_LR, **common)
        )
    if lr_policy == "linear":
        return _units(
            warmup_linear(cfg.OPTIM.LR, max_iters, cfg.SOLVER.MIN_LR, **common)
        )
    import logging

    logging.warning(
        "Only 'multistep', 'cosine' or 'linear' lr policy is accepted, got %s",
        lr_policy,
    )
    return None
