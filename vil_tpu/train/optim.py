"""Optimizers (reference /root/reference/src/optim/).

optax-based factory matching the reference zoo: sgd / qhm / adam / adamw /
lamb (optim/__init__.py:45-62), with the reference's two-group weight-decay
split: params whose name matches the model's no-decay set get WD0 (default
0), everything else gets WD (optim/__init__.py:21-40).

QHM (quasi-hyperbolic momentum, qhm.py:8-124) is implemented as a custom
optax transform:

    h(k) = (1-β)·g(k) + β·h(k-1)
    d(k) = (1-ν)·g(k) + ν·h(k)
    x(k+1) = x(k) - α·d(k)

with L2 weight decay added to the gradient before the momentum update.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax

from ..models.msvit import NO_WEIGHT_DECAY_SUBSTRINGS

ScalarOrSchedule = Union[float, Callable]


def decay_mask(params: Any, no_decay_substrings=NO_WEIGHT_DECAY_SUBSTRINGS) -> Any:
    """True where weight decay applies (name-substring rule, reference
    optim/__init__.py:27-37)."""

    def _mask(path, _):
        name = "/".join(str(k.key) for k in path)
        return not any(nd in name for nd in no_decay_substrings)

    return jax.tree_util.tree_map_with_path(_mask, params)


class QHMState(NamedTuple):
    h: Any  # momentum buffer


def qhm(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    nu: float = 1.0,
    weight_decay: float = 0.0,
    mask: Any = None,
) -> optax.GradientTransformation:
    """Quasi-hyperbolic momentum with coupled (L2) weight decay."""

    def init(params):
        return QHMState(h=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params=None):
        if weight_decay > 0:
            assert params is not None
            if mask is not None:
                m = mask(params) if callable(mask) else mask
                grads = jax.tree_util.tree_map(
                    lambda g, p, mm: g + weight_decay * p if mm else g,
                    grads, params, m,
                )
            else:
                grads = jax.tree_util.tree_map(
                    lambda g, p: g + weight_decay * p, grads, params
                )
        h = jax.tree_util.tree_map(
            lambda g, hh: (1 - momentum) * g + momentum * hh, grads, state.h
        )
        d = jax.tree_util.tree_map(lambda g, hh: (1 - nu) * g + nu * hh, grads, h)
        return d, QHMState(h=h)

    scale = (
        optax.scale_by_learning_rate(learning_rate)
        if callable(learning_rate)
        else optax.scale(-learning_rate)
    )
    return optax.chain(optax.GradientTransformation(init, update), scale)


def get_opt(cfg, params: Any, lr: ScalarOrSchedule | None = None) -> optax.GradientTransformation:
    """Build the optimizer from config (reference optim/__init__.py:14-64).

    ``lr`` may be a schedule; defaults to the constant cfg.OPTIM.LR.
    """
    if lr is None:
        lr = cfg.OPTIM.LR
    name = cfg.OPTIM.OPT
    wd, wd0 = cfg.OPTIM.WD, cfg.OPTIM.WD0
    mom = cfg.OPTIM.MOM
    b1, b2, eps = cfg.OPTIM.ADAM.BETA1, cfg.OPTIM.ADAM.BETA2, cfg.OPTIM.ADAM.EPS
    mask = decay_mask(params)
    inv_mask = jax.tree_util.tree_map(lambda b: not b, mask)

    def with_wd0(tx: optax.GradientTransformation) -> optax.GradientTransformation:
        """Reference applies WD0 (default 0) to the no-decay group."""
        if wd0 > 0:
            return optax.chain(
                optax.add_decayed_weights(wd0, mask=inv_mask), tx
            )
        return tx

    if name == "sgd":
        # torch SGD: coupled L2 before momentum, no dampening
        return with_wd0(
            optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.trace(decay=mom, nesterov=False),
                optax.scale_by_learning_rate(lr),
            )
        )
    if name == "qhm":
        return qhm(lr, momentum=mom, nu=cfg.OPTIM.NU, weight_decay=wd, mask=mask)
    if name == "adam":
        # torch Adam with weight_decay = coupled L2
        return with_wd0(
            optax.chain(
                optax.add_decayed_weights(wd, mask=mask),
                optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                optax.scale_by_learning_rate(lr),
            )
        )
    if name == "adamw":
        return with_wd0(
            optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd, mask=mask)
        )
    if name == "lamb":
        return with_wd0(
            optax.lamb(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd, mask=mask)
        )
    raise ValueError(f"Optimizer {name} not supported!")
