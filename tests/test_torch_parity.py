"""Golden numerics: our model vs the actual reference torch model (CPU).

The strongest correctness oracle available without downloading released
checkpoints: instantiate the reference MsViT (via the timm/torchvision shim),
export its randomly-initialized state dict, import it through
``vil_tpu.utils.torch_import``, and require logits to match to float32
tolerance on random inputs. Exercises the checkpoint importer, layout
transposes, the ARCH parser, patch-embed/APE/RPE wiring, every attention
path, the masking semantics, and the softmax/LN numerics simultaneously.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vil_tpu.models import MsViT
from vil_tpu.utils.torch_import import import_torch_checkpoint

from reference_shim import get_reference_msvit

ARCH = "l1,h1,d32,n1,s1,g1,p4,f4_l2,h2,d64,n1,s1,g1,p2,f4_l3,h2,d64,n1,s0,g0,p2,f4"
IMG = 64


def _run_pair(attn_type, arch=ARCH, img=IMG, sharew=True, rpe_arch=False,
              batch=2, num_classes=10, **kw):
    torch.manual_seed(0)
    RefMsViT = get_reference_msvit()
    if rpe_arch:
        arch = arch.replace("f4", "f4,a0")
    ref = RefMsViT(
        arch=arch, img_size=img, num_classes=num_classes, attn_type=attn_type,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        norm_embed=True, sharew=sharew, **kw,
    )
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = MsViT(
        arch=arch, img_size=img, num_classes=num_classes, attn_type=attn_type,
        norm_embed=True, sharew=sharew, dtype=jnp.float32, **kw,
    )
    x_np = np.random.default_rng(1).standard_normal(
        (batch, img, img, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_np))
    params = import_torch_checkpoint(state, variables["params"], strict=True)
    new_vars = dict(variables)
    new_vars["params"] = params

    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(new_vars, jnp.asarray(x_np)))
    return ref_out, ours


@pytest.mark.parametrize("attn_type", ["full", "longformerhand", "linformer", "srformer"])
def test_logits_match_reference(attn_type):
    ref_out, ours = _run_pair(attn_type)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_logits_match_reference_rpe():
    ref_out, ours = _run_pair("longformerhand", rpe_arch=True)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_logits_match_reference_full_rpe():
    ref_out, ours = _run_pair("full", rpe_arch=True)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("exact", [1, -1])
def test_logits_match_reference_masking_variants(exact):
    ref_out, ours = _run_pair("longformerhand", sw_exact=exact)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_logits_match_reference_unshared_w():
    ref_out, ours = _run_pair("longformerhand", sharew=False)
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_logits_match_reference_mode_static():
    """Random-shift mode>0: eval forces mode 0 in the reference; compare our
    static mode variants against a torch forward with module.mode forced."""
    torch.manual_seed(0)
    RefMsViT = get_reference_msvit()
    ref = RefMsViT(
        arch=ARCH, img_size=IMG, num_classes=10, attn_type="longformerhand",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        norm_embed=True, sharew=True, mode=-1,
    )
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = MsViT(
        arch=ARCH, img_size=IMG, num_classes=10, attn_type="longformerhand",
        norm_embed=True, sharew=True, dtype=jnp.float32,
    )
    x_np = np.random.default_rng(2).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_np))
    params = import_torch_checkpoint(state, variables["params"], strict=True)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        model.apply({"params": params}, jnp.asarray(x_np), mode=-1)
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_logits_match_reference_flagship_vil_small_224():
    """Flagship-shape golden parity: the REAL vil_small arch at 224² in f32
    (reference README.md:217: 4 stages, d96..d768, W=7 → 56×56 grids with
    pad-49 paths, nglo=1, sticky-full stages 3-4). Catches layout/ordering
    bugs that only bite at the production shape; toy-shape tests can't."""
    from vil_tpu.models import ARCH_ZOO

    ref_out, ours = _run_pair(
        "longformerhand", arch=ARCH_ZOO["vil_small"], img=224, batch=1,
        num_classes=1000,
    )
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_pos_embed_resize_on_resolution_change():
    """Load a 64px checkpoint into a 96px model: pos embeds must be resized
    (checkpoint.py:98-108) and the forward must run."""
    torch.manual_seed(0)
    RefMsViT = get_reference_msvit()
    ref = RefMsViT(
        arch=ARCH, img_size=IMG, num_classes=10, attn_type="longformerhand",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
        norm_embed=True, sharew=True,
    )
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    model = MsViT(
        arch=ARCH, img_size=96, num_classes=10, attn_type="longformerhand",
        norm_embed=True, sharew=True, dtype=jnp.float32,
    )
    x = jnp.ones((1, 96, 96, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    params = import_torch_checkpoint(state, variables["params"], strict=True)
    out = model.apply({"params": params}, x)
    assert out.shape == (1, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_performer_logits_match_reference():
    """Performer parity: import the torch model's random-feature projection
    buffers too (fast_attention.projection_matrix -> buffers collection)."""
    from vil_tpu.utils.torch_import import import_torch_checkpoint

    torch.manual_seed(0)
    RefMsViT = get_reference_msvit()
    arch = ARCH.replace("f4", "f8")  # nb_features = 8
    ref = RefMsViT(
        arch=arch, img_size=IMG, num_classes=10, attn_type="performer",
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0, norm_embed=True,
    )
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    model = MsViT(
        arch=arch, img_size=IMG, num_classes=10, attn_type="performer",
        norm_embed=True, dtype=jnp.float32,
    )
    x_np = np.random.default_rng(3).standard_normal((2, IMG, IMG, 3)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x_np))
    params = import_torch_checkpoint(state, variables["params"], strict=True)
    buffers = import_torch_checkpoint(state, variables["buffers"], strict=True)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x_np.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(
        model.apply({"params": params, "buffers": buffers}, jnp.asarray(x_np))
    )
    np.testing.assert_allclose(ours, ref_out, atol=5e-4, rtol=1e-3)
