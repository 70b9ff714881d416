"""Import reference PyTorch checkpoints into vil_tpu flax parameter trees.

The reference saves ``{"net": state_dict, "arch", "epoch", "best_acc", ...}``
(/root/reference/src/utils/checkpoint.py:170-176) with torch module names
like ``layer1.0.proj.weight``. This module maps those onto our flax tree:

  torch module                      flax path
  layer{k}.0                        stage{k}_patch_embed
  layer{k}.{1+2i}                   stage{k}_block{i}_attn
  layer{k}.{2+2i}                   stage{k}_block{i}_mlp
  norm / head                       norm / head

with the layout conversions (torch Linear (out,in) → Dense kernel (in,out);
torch Conv (O,I,kh,kw) → flax Conv (kh,kw,I,O); LayerNorm weight→scale) and
the reference's fuzzy-loading behaviors (checkpoint.py:10-131): ``module.``
prefix stripping, bilinear resize of 1-D x/y position embeddings and of the
2-D relative-position bias table on shape mismatch, and classifier-head
truncation — so released ``.pth`` checkpoints load across resolutions.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth`` file into {torch_name: numpy array}."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "net" in blob:
        state = blob["net"]
    elif isinstance(blob, dict) and "model" in blob:
        state = blob["model"]
    else:
        state = blob
    out = {}
    for k, v in state.items():
        # strip DataParallel/DDP prefix (checkpoint.py:10-17)
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


# ---------------------------------------------------------------------------
# shape adaptation (checkpoint.py:20-41, applied at :98-117)
# ---------------------------------------------------------------------------
def resize_pos_embed_1d(posemb: np.ndarray, shape_new: tuple) -> np.ndarray:
    """Bilinear-resize a (1, N, C) positional embedding along N."""
    ntok_new = shape_new[1]
    out = jax.image.resize(
        jnp.asarray(posemb, dtype=jnp.float32),
        (posemb.shape[0], ntok_new, posemb.shape[2]),
        method="linear",
    )
    return np.asarray(out)


def resize_pos_embed_2d(posemb: np.ndarray, shape_new: tuple) -> np.ndarray:
    """Bilinear-resize a flattened 2-D bias table (gs_old², nH) → (gs_new², nH)."""
    gs_old = int(np.sqrt(posemb.shape[0]))
    gs_new = int(np.sqrt(shape_new[0]))
    grid = jnp.asarray(posemb, dtype=jnp.float32).reshape(gs_old, gs_old, -1)
    out = jax.image.resize(grid, (gs_new, gs_new, grid.shape[-1]), method="linear")
    return np.asarray(out.reshape(gs_new * gs_new, -1))


def _adapt(
    name: str, value: np.ndarray, target_shape: tuple, num_classes_trunc: bool = True
) -> np.ndarray | None:
    """Reconcile a checkpoint tensor with the model's expected shape.

    Mirrors align_and_update_state_dicts' shape handling
    (checkpoint.py:91-120): resize pos-embeds / RPE tables, truncate the
    classifier head, otherwise skip (return None).
    """
    if tuple(value.shape) == tuple(target_shape):
        return value
    if "x_pos_embed" in name or "y_pos_embed" in name:
        return resize_pos_embed_1d(value, target_shape)
    if "local_relative_position_bias_table" in name:
        return resize_pos_embed_2d(value, target_shape)
    if name.startswith("head.") and num_classes_trunc:
        if value.shape[0] > target_shape[0]:
            logger.warning("Truncating %s: %s -> %s", name, value.shape, target_shape)
            return value[: target_shape[0]]
        if value.ndim == 2 and value.shape[1] > target_shape[1]:
            return value[:, : target_shape[1]]
    logger.warning(
        "Skipping %s: ckpt %s vs model %s", name, value.shape, target_shape
    )
    return None


# ---------------------------------------------------------------------------
# structural key mapping
# ---------------------------------------------------------------------------
_LEAF_DIRECT = {
    "cls_token",
    "cls_pos_embed",
    "x_pos_embed",
    "y_pos_embed",
    "local_relative_position_bias_table",
    "g2l_relative_position_bias",
    "g2g_relative_position_bias",
    "proj_k",
    "proj_v",
    "projection_matrix",
}


def _flax_path_to_torch_key(path: tuple) -> str | None:
    """Translate a flax param path to the reference torch state-dict name."""
    parts = [p.key if hasattr(p, "key") else str(p) for p in path]
    top = parts[0]
    m = re.match(r"stage(\d+)_patch_embed$", top)
    if m:
        prefix = f"layer{m.group(1)}.0"
        rest = parts[1:]
    else:
        m = re.match(r"stage(\d+)_block(\d+)_(attn|mlp)$", top)
        if m:
            k, i, kind = int(m.group(1)), int(m.group(2)), m.group(3)
            idx = 1 + 2 * i if kind == "attn" else 2 + 2 * i
            prefix = f"layer{k}.{idx}"
            rest = parts[1:]
        elif top in ("norm", "head"):
            prefix = top
            rest = parts[1:]
        else:
            return None

    if not rest:  # direct leaf at module level
        return prefix

    torch_parts = [prefix]
    for j, p in enumerate(rest):
        last = j == len(rest) - 1
        if last:
            if p == "kernel":
                torch_parts.append("weight")
            elif p == "scale":
                torch_parts.append("weight")
            elif p == "bias":
                torch_parts.append("bias")
            elif p == "projection_matrix":
                # performer buffer lives under the FastAttention submodule in
                # torch (performer.py:133) but directly on our module
                torch_parts.append("fast_attention.projection_matrix")
            elif p in _LEAF_DIRECT:
                torch_parts.append(p)
            else:
                torch_parts.append(p)
        else:
            if p == "droppath":
                return None
            if p == "shortcut":
                # torch shortcut is nn.Sequential(Linear, Dropout)
                torch_parts.append("shortcut.0")
            elif p == "fast_attention":
                torch_parts.append("fast_attention")
            else:
                torch_parts.append(p)
    return ".".join(torch_parts)


def _convert_layout(torch_key: str, value: np.ndarray, target_shape: tuple) -> np.ndarray:
    """Torch → flax tensor layout for weights."""
    if torch_key.endswith(".weight"):
        if value.ndim == 4:  # Conv2d (O, I, kh, kw) → (kh, kw, I, O)
            return value.transpose(2, 3, 1, 0)
        if value.ndim == 2 and len(target_shape) == 2:
            # Linear (out, in) → Dense (in, out); LayerNorm weight is 1-D
            return value.T
    return value


def import_torch_checkpoint(
    state: Dict[str, np.ndarray], flax_params: Any, strict: bool = False
) -> Any:
    """Fill a flax params pytree from a torch state dict.

    Returns a new pytree; unmatched model params keep their initialized
    values (with a warning), matching the reference's lenient loading.
    """
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    used = set()
    replacements = {}
    missing = []
    for path, value in flat:
        torch_key = _flax_path_to_torch_key(path)
        if torch_key is None:
            continue
        if torch_key not in state:
            # fuzzy fallback: unique ckpt key with matching suffix
            # (align_and_update_state_dicts, checkpoint.py:44-131)
            cands = [k for k in state if k.endswith(torch_key)]
            if len(cands) == 1:
                torch_key = cands[0]
            else:
                missing.append(torch_key)
                continue
        raw = state[torch_key]
        converted = _convert_layout(torch_key, raw, value.shape)
        adapted = _adapt(torch_key, converted, value.shape)
        if adapted is None:
            continue
        replacements[path] = jnp.asarray(adapted, dtype=value.dtype)
        used.add(torch_key)

    if missing:
        msg = f"{len(missing)} params not found in checkpoint: {missing[:8]}..."
        if strict:
            raise KeyError(msg)
        logger.warning(msg)
    unused = [k for k in state if k not in used and "relative_position_index" not in k
              and "calls_since_last_redraw" not in k]
    if unused:
        logger.info("%d checkpoint tensors unused: %s...", len(unused), unused[:8])

    def _replace(path, value):
        return replacements.get(path, value)

    return jax.tree_util.tree_map_with_path(_replace, flax_params)


def load_into_model(path: str, flax_params: Any, strict: bool = False) -> Any:
    """Convenience: .pth file → updated flax params."""
    return import_torch_checkpoint(load_torch_state_dict(path), flax_params, strict)


def load_into_variables(path: str, variables: dict, strict: bool = False) -> dict:
    """Fill BOTH params and non-trainable collections (e.g. the performer's
    ``buffers/projection_matrix``) from a torch checkpoint."""
    state = load_torch_state_dict(path)
    out = dict(variables)
    out["params"] = import_torch_checkpoint(state, variables["params"], strict)
    if "buffers" in variables and variables["buffers"]:
        out["buffers"] = import_torch_checkpoint(
            state, variables["buffers"], strict=False
        )
    return out
