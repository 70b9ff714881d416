"""Mixup / CutMix (timm ``Mixup`` semantics, reference run_experiment.py:125-131).

Runs ON DEVICE inside the jitted train step (batch mode): a single λ per
batch, optional switch between mixup and cutmix, labels folded into smoothed
soft targets — so the host data path stays trivial and the TPU does the
blending.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def one_hot(targets: jax.Array, num_classes: int, on: float, off: float) -> jax.Array:
    return jax.nn.one_hot(targets, num_classes) * (on - off) + off


def _rand_bbox(rng, h: int, w: int, lam: jax.Array):
    """CutMix box with area ratio (1-λ); returns (y0, x0, bh, bw)."""
    ratio = jnp.sqrt(1.0 - lam)
    bh = (h * ratio).astype(jnp.int32)
    bw = (w * ratio).astype(jnp.int32)
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, h)
    cx = jax.random.randint(rx, (), 0, w)
    y0 = jnp.clip(cy - bh // 2, 0, h)
    x0 = jnp.clip(cx - bw // 2, 0, w)
    y1 = jnp.clip(cy + bh // 2, 0, h)
    x1 = jnp.clip(cx + bw // 2, 0, w)
    return y0, x0, y1, x1


def make_mixup_fn(
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
    num_classes: int = 1000,
) -> Callable[[jax.Array, jax.Array, jax.Array], Tuple[jax.Array, jax.Array]]:
    """Returns fn(rng, images NHWC, int targets) -> (mixed images, soft targets)."""

    def mixup_fn(rng, images, targets):
        b, h, w, _ = images.shape
        r_apply, r_switch, r_lam_m, r_lam_c, r_box = jax.random.split(rng, 5)
        off = label_smoothing / num_classes
        on = 1.0 - label_smoothing + off
        y = one_hot(targets, num_classes, on, off)
        y_flip = y[::-1]

        use_cutmix = jnp.logical_and(
            cutmix_alpha > 0,
            jnp.logical_or(
                mixup_alpha <= 0, jax.random.uniform(r_switch) < switch_prob
            ),
        )
        lam_mix = (
            jax.random.beta(r_lam_m, mixup_alpha, mixup_alpha)
            if mixup_alpha > 0 else jnp.float32(1.0)
        )
        lam_cut = (
            jax.random.beta(r_lam_c, cutmix_alpha, cutmix_alpha)
            if cutmix_alpha > 0 else jnp.float32(1.0)
        )

        # mixup branch
        lam_m = lam_mix.astype(images.dtype)
        mixed_mix = images * lam_m + images[::-1] * (1 - lam_m)

        # cutmix branch: paste flipped batch's box; λ corrected to box area
        y0, x0, y1, x1 = _rand_bbox(r_box, h, w, lam_cut)
        yy = jnp.arange(h)[None, :, None, None]
        xx = jnp.arange(w)[None, None, :, None]
        in_box = (yy >= y0) & (yy < y1) & (xx >= x0) & (xx < x1)
        mixed_cut = jnp.where(in_box, images[::-1], images)
        lam_cut_eff = 1.0 - ((y1 - y0) * (x1 - x0)) / (h * w)

        mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
        lam = jnp.where(use_cutmix, lam_cut_eff, lam_mix).astype(jnp.float32)
        y_out = y * lam + y_flip * (1 - lam)

        # apply with probability `prob` (batch mode)
        apply = jax.random.uniform(r_apply) < prob
        images_out = jnp.where(apply, mixed, images)
        y_out = jnp.where(apply, y_out, y)
        return images_out, y_out

    return mixup_fn


def mixup_from_cfg(cfg):
    """Reference Mixup wiring (run_experiment.py:122-131): active when
    MIXUP_PROB > 0 and (MIXUP > 0 or MIXCUT > 0)."""
    aug = cfg.AUG
    if aug.MIXUP_PROB <= 0.0 or (aug.MIXUP <= 0.0 and aug.MIXCUT <= 0.0):
        return None
    return make_mixup_fn(
        mixup_alpha=aug.MIXUP,
        cutmix_alpha=aug.MIXCUT,
        prob=aug.MIXUP_PROB,
        switch_prob=aug.MIXUP_SWITCH_PROB,
        label_smoothing=cfg.LOSS.LABEL_SMOOTHING,
        num_classes=cfg.DATA.NUM_CLASSES,
    )
