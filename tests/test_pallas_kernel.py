"""Fused Pallas sliding-chunk kernel vs the XLA tier and the dense oracle.

Runs the kernel in interpreter mode on CPU (the driver benches the compiled
kernel on real TPU hardware).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.ops import masks as masks_lib
from vil_tpu.ops import rpe as rpe_lib
from vil_tpu.ops import sliding_chunk as sc
from vil_tpu.ops.pallas import vil_kernel


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(vil_kernel, "INTERPRET", True)


def _random_inputs(key, BH, mx, my, w, M, nglo, with_bias, H=1):
    w2 = w * w
    ks = jax.random.split(key, 6)
    q = jax.random.normal(ks[0], (BH, mx, my, w2, M))
    k = jax.random.normal(ks[1], (BH, mx, my, w2, M))
    v = jax.random.normal(ks[2], (BH, mx, my, w2, M))
    k_glo = jax.random.normal(ks[3], (BH, nglo, M)) if nglo else None
    v_glo = jax.random.normal(ks[4], (BH, nglo, M)) if nglo else None
    bias = (
        jax.random.normal(ks[5], (H, w2, nglo + 9 * w2)) * 0.5 if with_bias else None
    )
    return q, k, v, k_glo, v_glo, bias


@pytest.mark.parametrize("nglo,with_bias", [(1, True), (0, False), (2, False), (1, False)])
@pytest.mark.parametrize("exact", [0, -1])
def test_pallas_matches_xla(nglo, with_bias, exact):
    BH, mx, my, w, M = 4, 3, 3, 3, 8
    w2 = w * w
    padx, pady = 1, 2
    mask_bool = masks_lib.invalid_mask(mx, my, padx, pady, w, exact, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(0), BH, mx, my, w, M, nglo, with_bias
    )
    out_pallas = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, 1, interpret=True
    )
    out_xla = vil_kernel._xla_reference(q, k, v, k_glo, v_glo, bias, mask_add)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


def test_fast_max_matches_exact_max(monkeypatch):
    """VIL_TPU_FAST_MAX (r5, INFERENCE path): the center-block softmax max
    must be an EXACT substitute for the full 9W²-row max — softmax is
    shift-invariant — under a padding mask (the center block always holds
    the never-masked self column for valid rows). The TRAIN (with_lse)
    path must be untouched by the flag (exact max, exact LSE)."""
    BH, mx, my, w, M, nglo, H = 2, 3, 3, 3, 8, 1, 2
    w2 = w * w
    C = H * M
    mask_bool = masks_lib.invalid_mask(mx, my, 2, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(17), BH, mx, my, w, C, nglo, True, H=H
    )

    def run(with_lse):
        res = vil_kernel._pallas_forward_mh(
            q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
            with_lse=with_lse,
        )
        if with_lse:
            return np.asarray(res[0]), np.asarray(res[1])
        return np.asarray(res), None

    monkeypatch.setattr(vil_kernel, "FAST_MAX", True)
    out_fast, _ = run(False)
    lse_out_fast, lse_fast = run(True)
    monkeypatch.setattr(vil_kernel, "FAST_MAX", False)
    out_exact, _ = run(False)
    lse_out_exact, lse_exact = run(True)
    # inference path: shift-invariance makes the center max exact
    np.testing.assert_allclose(out_fast, out_exact, atol=1e-5, rtol=1e-5)
    # train (with_lse) path: identical with the flag on or off
    np.testing.assert_allclose(lse_out_fast, lse_out_exact, atol=0, rtol=0)
    np.testing.assert_allclose(lse_fast, lse_exact, atol=0, rtol=0)

    # pathological guard: craft a row whose CENTER block is fully masked
    # while off-center columns stay valid — the clamp must keep the
    # inference forward finite (no inf/NaN), since such rows exist only as
    # discarded padding
    bad = np.asarray(mask_add).copy()
    bad[0, :, 4 * w2 : 5 * w2] = vil_kernel._NEG_INF  # mask every center col
    bad = jnp.asarray(bad)
    monkeypatch.setattr(vil_kernel, "FAST_MAX", True)
    out_bad = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, bad, H, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(out_bad)))


def test_pallas_matches_xla_exact_mask():
    BH, mx, my, w, M, nglo = 2, 2, 3, 3, 8, 1
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 0, w, 1, 0)  # exact: per-pixel
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    assert mask_add.shape[2] == w2
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(1), BH, mx, my, w, M, nglo, True
    )
    out_pallas = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, 1, interpret=True
    )
    out_xla = vil_kernel._xla_reference(q, k, v, k_glo, v_glo, bias, mask_add)
    np.testing.assert_allclose(
        np.asarray(out_pallas), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


def test_fused_custom_vjp_grads_match_xla():
    BH, mx, my, w, M, nglo = 2, 3, 3, 2, 4, 1
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(2), BH, mx, my, w, M, nglo, True
    )
    fused = vil_kernel.make_fused_vil_attention_mh(mask_add, 1)

    def loss_fused(*args):
        return jnp.sum(fused(*args) ** 2)

    def loss_xla(*args):
        return jnp.sum(vil_kernel._xla_reference(*args, mask_add) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, k_glo, v_glo, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(q, k, v, k_glo, v_glo, bias)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_fused_matches_dense_reference_end_to_end():
    """Pallas path vs brute-force dense attention on the full local+global
    pipeline (mirrors the reference test_cuda_kernel.py strategy)."""
    B, H, nglo, w, M = 1, 2, 1, 3, 4
    nx = ny = 6  # 2x2 chunks, no padding
    w2 = w * w
    padx, pady, mx, my = sc.chunk_grid(nx, ny, w)
    BH = B * H
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 5)
    q_tok = jax.random.normal(ks[0], (BH, nx * ny, M))
    k_tok = jax.random.normal(ks[1], (BH, nx * ny, M))
    v_tok = jax.random.normal(ks[2], (BH, nx * ny, M))
    k_glo = jax.random.normal(ks[3], (BH, nglo, M))
    v_glo = jax.random.normal(ks[4], (BH, nglo, M))

    mask_bool = masks_lib.invalid_mask(mx, my, padx, pady, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    qc, kc, vc = (sc.chunkify(t, nx, ny, w) for t in (q_tok, k_tok, v_tok))
    out = vil_kernel._pallas_forward_mh(
        qc, kc, vc, k_glo, v_glo, None, mask_add, 1, interpret=True
    )
    out = sc.unchunkify(out, nx, ny, w)

    # dense oracle over [global ‖ local] keys with the blockwise mask
    # scattered into token space
    allowed = np.zeros((nx * ny, nx * ny), dtype=bool)
    for ci in range(mx * my):
        cqx, cqy = ci // my, ci % my
        for j in range(9 * w2):
            if mask_bool[ci, j]:
                continue
            kcx = (cqx + (j // w2) // 3 - 1) % mx
            kcy = (cqy + (j // w2) % 3 - 1) % my
            kx = kcx * w + (j % w2) // w
            ky = kcy * w + (j % w2) % w
            for l in range(w2):
                qx, qy = cqx * w + l // w, cqy * w + l % w
                allowed[qx * ny + qy, kx * ny + ky] = True
    scores_loc = jnp.einsum("bnc,btc->bnt", q_tok, k_tok)
    scores_loc = jnp.where(jnp.asarray(allowed)[None], scores_loc, -jnp.inf)
    scores_glo = jnp.einsum("bnc,btc->bnt", q_tok, k_glo)
    scores = jnp.concatenate([scores_glo, scores_loc], axis=-1)
    probs = jax.nn.softmax(scores - scores.max(-1, keepdims=True), axis=-1)
    dense = jnp.einsum(
        "bnt,btc->bnc", probs, jnp.concatenate([v_glo, v_tok], axis=1)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=1e-5)


@pytest.mark.parametrize("rpe,nglo", [(False, 1), (True, 1), (False, 0)])
def test_vil_attention_module_fused_matches_xla(rpe, nglo):
    """VilAttention(use_pallas=True) must equal the XLA-tier module output,
    forward and gradient."""
    from vil_tpu.models.attention import VilAttention

    nx = ny = 8
    w = 3
    dim, heads = 16, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (2, nglo + nx * ny, dim))

    def make(use_pallas):
        return VilAttention(
            dim=dim, num_heads=heads, w=w, nglo=nglo, rpe=rpe, sharew=True,
            use_pallas=use_pallas,
        )

    ref_mod = make(False)
    variables = ref_mod.init({"params": jax.random.PRNGKey(1)}, x, nx, ny, True)
    out_ref = ref_mod.apply(variables, x, nx, ny, True)
    out_fused = make(True).apply(variables, x, nx, ny, True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), atol=1e-5, rtol=1e-5
    )

    def loss(mod, params):
        return jnp.sum(mod.apply({"params": params}, x, nx, ny, True) ** 2)

    g_ref = jax.grad(lambda p: loss(ref_mod, p))(variables["params"])
    g_fused = jax.grad(lambda p: loss(make(True), p))(variables["params"])
    for a, b in zip(jax.tree_util.tree_leaves(g_fused), jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("nglo,with_bias,H", [(1, True, 2), (0, False, 4), (2, False, 1)])
def test_pallas_mh_matches_xla(nglo, with_bias, H):
    """Multi-head kernel (channel-packed layout) vs the XLA reference."""
    B, mx, my, w, M = 2, 3, 3, 3, 8
    C = H * M
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 2, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    q = jax.random.normal(ks[0], (B, mx, my, w2, C))
    k = jax.random.normal(ks[1], (B, mx, my, w2, C))
    v = jax.random.normal(ks[2], (B, mx, my, w2, C))
    kg = jax.random.normal(ks[3], (B, nglo, C)) if nglo else None
    vg = jax.random.normal(ks[4], (B, nglo, C)) if nglo else None
    bias = (
        jax.random.normal(ks[5], (H, w2, nglo + 9 * w2)) * 0.5 if with_bias else None
    )
    out_p = vil_kernel._pallas_forward_mh(
        q, k, v, kg, vg, bias, mask_add, H, interpret=True
    )
    out_x = vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias, mask_add, H)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )


def test_fused_mh_custom_vjp_grads():
    B, mx, my, w, M, H, nglo = 1, 3, 3, 2, 4, 2, 1
    C = H * M
    w2 = w * w
    mask_add = vil_kernel.mask_to_additive(
        masks_lib.invalid_mask(mx, my, 1, 1, w, 0, 0), mx, my, w2, nglo
    )
    ks = jax.random.split(jax.random.PRNGKey(6), 6)
    q = jax.random.normal(ks[0], (B, mx, my, w2, C))
    k = jax.random.normal(ks[1], (B, mx, my, w2, C))
    v = jax.random.normal(ks[2], (B, mx, my, w2, C))
    kg = jax.random.normal(ks[3], (B, nglo, C))
    vg = jax.random.normal(ks[4], (B, nglo, C))
    bias = jax.random.normal(ks[5], (H, w2, nglo + 9 * w2)) * 0.5
    fused = vil_kernel.make_fused_vil_attention_mh(mask_add, H)

    gf = jax.grad(lambda *a: jnp.sum(fused(*a) ** 2), argnums=(0, 1, 2, 3, 4, 5))(
        q, k, v, kg, vg, bias
    )
    gx = jax.grad(
        lambda *a: jnp.sum(vil_kernel._xla_reference_mh(*a, mask_add, H) ** 2),
        argnums=(0, 1, 2, 3, 4, 5),
    )(q, k, v, kg, vg, bias)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("nglo,with_bias", [(1, True), (0, False)])
def test_row_grid_variant_matches_whole_image(monkeypatch, nglo, with_bias):
    """Both grid strategies (whole-image resident vs 3-row BlockSpec) must
    agree; large shapes fall back to the row grid via the VMEM budget."""
    BH, mx, my, w, M = 2, 3, 2, 3, 8
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(3), BH, mx, my, w, M, nglo, with_bias
    )
    out_img = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, 1, interpret=True
    )
    monkeypatch.setattr(vil_kernel, "WHOLE_IMAGE_VMEM_BYTES", 0)
    # K/V alone still fit → the K/V-resident row-streamed tier engages
    out_kvres = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, 1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(out_kvres), atol=1e-6, rtol=1e-6
    )
    monkeypatch.setattr(vil_kernel, "KV_RES_VMEM_BYTES", 0)
    out_row = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, 1, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_img), np.asarray(out_row), atol=1e-6, rtol=1e-6
    )
    out_xla = vil_kernel._xla_reference(q, k, v, k_glo, v_glo, bias, mask_add)
    np.testing.assert_allclose(
        np.asarray(out_row), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "nglo,with_bias,H,with_lse",
    [(1, True, 2, False), (0, False, 3, True), (2, False, 2, True)],
)
def test_loop_rolled_whole_image_matches_unrolled(
    monkeypatch, nglo, with_bias, H, with_lse
):
    """The LOOP-rolled whole-image forward (_mh_kernel_img_loop — traced
    rows, SMEM row classes; selected when the unrolled variant's per-row f32
    temporaries ×mx overflow the VMEM budget, e.g. 384² stage 1) must match
    the statically unrolled kernel and the XLA oracle, incl. the LSE stash."""
    BH, mx, my, w, M = 2, 3, 3, 3, 8
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 2, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(7), BH, mx, my, w, M * H, nglo, with_bias, H=H
    )
    monkeypatch.setattr(vil_kernel, "FORCE_FWD_LOOP", True)
    out_loop = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    monkeypatch.setattr(vil_kernel, "FORCE_FWD_LOOP", False)
    out_unr = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    if with_lse:
        (out_loop, lse_loop), (out_unr, lse_unr) = out_loop, out_unr
        np.testing.assert_allclose(
            np.asarray(lse_loop), np.asarray(lse_unr), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_unr), atol=1e-6, rtol=1e-6
    )
    out_xla = vil_kernel._xla_reference_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H
    )
    np.testing.assert_allclose(
        np.asarray(out_loop), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "nglo,with_bias,H,with_lse,mx",
    [(1, True, 2, True, 3), (0, False, 3, False, 4), (2, True, 3, True, 3),
     (1, False, 1, False, 2), (1, False, 2, True, 1)],
)
def test_ring_whole_image_matches_plain(
    monkeypatch, nglo, with_bias, H, with_lse, mx
):
    """The RING-buffered unrolled whole-image forward (_mh_kernel_img_ring:
    persistent k/v scratch, one slot rewritten per row, phase-permuted comb
    tables) must match the plain unrolled kernel and the XLA oracle — incl.
    degenerate mx<3 grids where ring slots alias the same source rows."""
    my, w, M = 3, 3, 8
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 1, 2, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(13), 2, mx, my, w, M * H, nglo, with_bias, H=H
    )
    monkeypatch.setattr(vil_kernel, "USE_RING", True)
    out_ring = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    monkeypatch.setattr(vil_kernel, "USE_RING", False)
    out_plain = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    if with_lse:
        (out_ring, lse_r), (out_plain, lse_p) = out_ring, out_plain
        np.testing.assert_allclose(
            np.asarray(lse_r), np.asarray(lse_p), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_plain), atol=1e-6, rtol=1e-6
    )
    out_xla = vil_kernel._xla_reference_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H
    )
    np.testing.assert_allclose(
        np.asarray(out_ring), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize(
    "nglo,with_bias,H,with_lse",
    [(1, True, 2, False), (0, False, 3, True), (2, True, 3, True)],
)
def test_kv_resident_tier_matches_whole_image(
    monkeypatch, nglo, with_bias, H, with_lse
):
    """The K/V-resident row-streamed tier (_mh_kernel_kv_res — whole K/V
    resident with constant block index maps, Q/out/mask rows streamed over
    grid (B, mx); selected for huge chunk grids like 1024² stage 1 where
    q+k+v+out residency overflows but K/V alone fit) must match the
    whole-image kernel and the XLA oracle, incl. the LSE stash."""
    BH, mx, my, w, M = 2, 4, 3, 3, 8
    w2 = w * w
    mask_bool = masks_lib.invalid_mask(mx, my, 2, 1, w, 0, 0)
    mask_add = vil_kernel.mask_to_additive(mask_bool, mx, my, w2, nglo)
    q, k, v, k_glo, v_glo, bias = _random_inputs(
        jax.random.PRNGKey(11), BH, mx, my, w, M * H, nglo, with_bias, H=H
    )
    out_img = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    monkeypatch.setattr(vil_kernel, "WHOLE_IMAGE_VMEM_BYTES", 0)
    out_kv = vil_kernel._pallas_forward_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H, interpret=True,
        with_lse=with_lse,
    )
    if with_lse:
        (out_img, lse_img), (out_kv, lse_kv) = out_img, out_kv
        np.testing.assert_allclose(
            np.asarray(lse_kv), np.asarray(lse_img), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(out_kv), np.asarray(out_img), atol=1e-6, rtol=1e-6
    )
    out_xla = vil_kernel._xla_reference_mh(
        q, k, v, k_glo, v_glo, bias, mask_add, H
    )
    np.testing.assert_allclose(
        np.asarray(out_kv), np.asarray(out_xla), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("with_bias,H", [(False, 2), (True, 3)])
def test_fused_full_attention_matches_xla(monkeypatch, with_bias, H):
    from vil_tpu.ops.pallas import full_attention as fa

    monkeypatch.setattr(fa, "INTERPRET", True)
    B, N, M = 2, 13, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(ks[0], (B, N, C))
    k = jax.random.normal(ks[1], (B, N, C))
    v = jax.random.normal(ks[2], (B, N, C))
    bias = jax.random.normal(ks[3], (H, N, N)) * 0.3 if with_bias else None
    out_p = fa._pallas_forward(q, k, v, bias, H, interpret=True)
    out_x = fa._xla_reference(q, k, v, bias, H)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )

    # custom VJP grads match plain autodiff of the XLA reference
    fused = fa.make_fused_full_attention(H)
    args = (q, k, v, bias) if with_bias else (q, k, v)

    def loss_fused(*a):
        return jnp.sum(fused(*a, None) ** 2) if not with_bias else jnp.sum(
            fused(*a) ** 2
        )

    def loss_ref(*a):
        full = a if with_bias else (*a, None)
        return jnp.sum(fa._xla_reference(*full, H) ** 2)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize("H,with_lse", [(2, False), (3, True)])
def test_tiled_full_attention_matches_xla(monkeypatch, H, with_lse):
    """The q-TILED dense forward (huge-N escape for the s=0 stages at 1024²:
    K/V VMEM-resident with row-constant index maps, Q/out tiles streamed,
    padded query rows sliced off) must match the whole-image kernel and the
    XLA reference at a ragged N (N % TQ != 0), incl. the LSE stash; and the
    fused dispatcher must produce identical grads through the XLA-recompute
    backward when the tiled tier is forced."""
    from vil_tpu.ops.pallas import full_attention as fa

    B, N, M = 2, 13, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(ks[0], (B, N, C))
    k = jax.random.normal(ks[1], (B, N, C))
    v = jax.random.normal(ks[2], (B, N, C))
    res_t = fa._pallas_forward_tiled(
        q, k, v, H, interpret=True, with_lse=with_lse, tile_q=8
    )
    res_w = fa._pallas_forward(
        q, k, v, None, H, interpret=True, with_lse=with_lse
    )
    if with_lse:
        (out_t, lse_t), (out_w, lse_w) = res_t, res_w
        np.testing.assert_allclose(
            np.asarray(lse_t), np.asarray(lse_w), atol=1e-5, rtol=1e-5
        )
    else:
        out_t, out_w = res_t, res_w
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_w), atol=1e-6, rtol=1e-6
    )
    out_x = fa._xla_reference(q, k, v, None, H)
    np.testing.assert_allclose(
        np.asarray(out_t), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )

    # force the tiled tier through the fused dispatcher: grads must flow
    # via the TILED fused backward (supported_bwd_tiled) and match plain
    # autodiff of the XLA reference
    monkeypatch.setattr(fa, "VMEM_BUDGET_BYTES", 0)
    monkeypatch.setattr(fa, "INTERPRET", True)
    fused = fa.make_fused_full_attention(H)
    np.testing.assert_allclose(
        np.asarray(fused(q, k, v, None)), np.asarray(out_x),
        atol=1e-5, rtol=1e-5,
    )
    g_fused = jax.grad(lambda *a: jnp.sum(fused(*a, None) ** 2),
                       argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(lambda *a: jnp.sum(fa._xla_reference(*a, None, H) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )
    # and with the tiled backward disabled, the XLA-recompute fallback
    # must agree too
    monkeypatch.setattr(fa, "TILED_VMEM_BUDGET_BYTES", 0)
    assert not fa.supported_bwd_tiled(B, N, C, H, False)
    fused_xla_bwd = fa.make_fused_full_attention(H, use_pallas=False)
    g_xla = jax.grad(lambda *a: jnp.sum(fused_xla_bwd(*a, None) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_xla, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_dense_tile_env_override(monkeypatch):
    """VIL_TPU_DENSE_TILE_Q[_BWD] sweep knobs: a bare int applies to every
    N; an ``N:tq`` map targets one stage. The overridden tile must change
    nothing numerically (padded rows are exact no-ops)."""
    from vil_tpu.ops.pallas import full_attention as fa

    monkeypatch.setenv("VIL_TPU_DENSE_TILE_Q", "13:4,99:8")
    assert fa._env_tile("VIL_TPU_DENSE_TILE_Q", 13) == 4
    assert fa._env_tile("VIL_TPU_DENSE_TILE_Q", 99) == 8
    assert fa._env_tile("VIL_TPU_DENSE_TILE_Q", 7) is None
    monkeypatch.setenv("VIL_TPU_DENSE_TILE_Q", "16")
    assert fa._env_tile("VIL_TPU_DENSE_TILE_Q", 13) == 16
    assert fa._env_tile("VIL_TPU_DENSE_TILE_Q_BWD", 13) is None

    B, N, H, M = 2, 13, 2, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    q, k, v, g = (jax.random.normal(ks[i], (B, N, C)) for i in range(4))
    monkeypatch.setenv("VIL_TPU_DENSE_TILE_Q", "13:4")
    monkeypatch.setenv("VIL_TPU_DENSE_TILE_Q_BWD", "13:4")
    out, lse = fa._pallas_forward_tiled(
        q, k, v, H, interpret=True, with_lse=True
    )
    dq, dk, dv = fa._pallas_backward_tiled(q, k, v, g, lse, H, interpret=True)
    out_x, vjp = jax.vjp(
        lambda q, k, v: fa._xla_reference(q, k, v, None, H), q, k, v
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )
    for a, b in zip((dq, dk, dv), vjp(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize("H,tile_q", [(2, 8), (3, 4)])
def test_tiled_full_attention_backward_kernel(H, tile_q):
    """The q-tiled fused BACKWARD (_pallas_backward_tiled: one-exp-pass
    probs from the stashed LSE, dK/dV accumulated into f32 whole-sequence
    output blocks resident across the image's tiles) must match jax.vjp of
    the XLA reference at a ragged N, incl. zero contributions from padded
    query rows."""
    from vil_tpu.ops.pallas import full_attention as fa

    B, N, M = 2, 13, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(21), 4)
    q = jax.random.normal(ks[0], (B, N, C))
    k = jax.random.normal(ks[1], (B, N, C))
    v = jax.random.normal(ks[2], (B, N, C))
    g = jax.random.normal(ks[3], (B, N, C))
    _, lse = fa._pallas_forward_tiled(
        q, k, v, H, interpret=True, with_lse=True, tile_q=tile_q
    )
    dq, dk, dv = fa._pallas_backward_tiled(
        q, k, v, g, lse, H, interpret=True, tile_q=tile_q
    )
    _, vjp = jax.vjp(lambda q, k, v: fa._xla_reference(q, k, v, None, H),
                     q, k, v)
    dq_r, dk_r, dv_r = vjp(g)
    for a, b in ((dq, dq_r), (dk, dk_r), (dv, dv_r)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


@pytest.mark.parametrize("H,tile_q", [(2, 8), (3, 4)])
def test_tiled_full_attention_biased(monkeypatch, H, tile_q):
    """The BIASED q-tiled tier (r5): the (H, N, N) RPE bias stays in HBM and
    streams as (H, TQ, N) row tiles through both the forward and the fused
    backward; dbias comes from per-batch partial dS tensors summed XLA-side
    (the in-kernel batch accumulation the whole-image kernel uses is
    impossible here — the dbias block index varies in the inner grid
    coordinate). Forward, grads, and dbias must match the XLA reference at a
    ragged N (padded query rows contribute exactly zero via the +1e9 LSE
    pad), kernel-level AND through the fused dispatcher."""
    from vil_tpu.ops.pallas import full_attention as fa

    B, N, M = 2, 13, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(33), 5)
    q = jax.random.normal(ks[0], (B, N, C)) * 0.5
    k = jax.random.normal(ks[1], (B, N, C)) * 0.5
    v = jax.random.normal(ks[2], (B, N, C))
    g = jax.random.normal(ks[3], (B, N, C))
    bias = jax.random.normal(ks[4], (H, N, N)) * 0.3

    out, lse = fa._pallas_forward_tiled(
        q, k, v, H, bias=bias, interpret=True, with_lse=True, tile_q=tile_q
    )
    out_x, vjp = jax.vjp(
        lambda q, k, v, b: fa._xla_reference(q, k, v, b, H), q, k, v, bias
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )
    # biased forward must agree with the whole-image kernel's LSE too
    _, lse_w = fa._pallas_forward(q, k, v, bias, H, interpret=True,
                                  with_lse=True)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(lse_w), atol=1e-5, rtol=1e-5
    )
    dq, dk, dv, dbias = fa._pallas_backward_tiled(
        q, k, v, g, lse, H, bias=bias, interpret=True, tile_q=tile_q
    )
    for name, a, b in zip(
        ["dq", "dk", "dv", "dbias"], (dq, dk, dv, dbias), vjp(g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )

    # through the dispatcher: force the tiled tier (whole-image budget → 0)
    monkeypatch.setattr(fa, "VMEM_BUDGET_BYTES", 0)
    monkeypatch.setattr(fa, "INTERPRET", True)
    fused = fa.make_fused_full_attention(H)
    out_d, vjp_d = jax.vjp(lambda *a: fused(*a), q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(out_d), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )
    for name, a, b in zip(["dq", "dk", "dv", "dbias"], vjp_d(g), vjp(g)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4, err_msg=name
        )


def test_tiled_fast_max_matches_exact(monkeypatch):
    """The dense tiled tier's prefix-128 FAST_MAX (r5, inference only) must
    be an exact substitute for the full N-wide row max at N > 128; the
    with_lse (train) path is untouched by the flag."""
    from vil_tpu.ops.pallas import full_attention as fa

    B, N, H, M = 2, 200, 2, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(71), 5)
    q = jax.random.normal(ks[0], (B, N, C)) * 0.5
    k = jax.random.normal(ks[1], (B, N, C)) * 0.5
    v = jax.random.normal(ks[2], (B, N, C))
    bias = jax.random.normal(ks[4], (H, N, N)) * 0.3

    def run(with_lse):
        res = fa._pallas_forward_tiled(
            q, k, v, H, bias=bias, interpret=True, with_lse=with_lse,
            tile_q=64,
        )
        return res if with_lse else (res, None)

    from vil_tpu.ops.pallas import vil_kernel

    monkeypatch.setattr(vil_kernel, "FAST_MAX", True)
    out_f, _ = run(False)
    out_lse_f, lse_f = run(True)
    monkeypatch.setattr(vil_kernel, "FAST_MAX", False)
    out_e, _ = run(False)
    out_lse_e, lse_e = run(True)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_e), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_lse_f), np.asarray(out_lse_e), atol=0, rtol=0
    )
    np.testing.assert_allclose(
        np.asarray(lse_f), np.asarray(lse_e), atol=0, rtol=0
    )


def test_tiled_bwd_hbm_guard():
    """supported_bwd_tiled falls back (False) when the biased per-batch
    dbias partials would exceed the transient-HBM ceiling."""
    from vil_tpu.ops.pallas import full_attention as fa

    # N=4097, H=8, C=512: biased tiled bwd fits VMEM at B=4 (≈2.1 GB
    # partials) but not at B=8 (≈4.2 GB > 3 GB ceiling)
    assert fa.supported_bwd_tiled(4, 4097, 512, 8, True)
    assert not fa.supported_bwd_tiled(8, 4097, 512, 8, True)
    # bias-free is B-independent
    assert fa.supported_bwd_tiled(8, 4097, 512, 8, False)


def test_dense_tier_gating_rpe_shapes():
    """The r5 budget/tile wiring must engage the fused paths at the real
    RPE shapes the r4 review flagged as falling back to XLA recompute:
    384² stage-3 biased whole-image backward (H=8/C=512 and H=6/C=384
    under the 84 MB biased budget; H=12/C=768 still over) and the 1024²
    biased q-tiled tiers (forward streams bias at tq=128, backward at a
    sub-128 tile via the transposed-LSE layout)."""
    from vil_tpu.ops.pallas import full_attention as fa

    assert fa.supported_bwd(16, 577, 512, 8, True)
    assert fa.supported_bwd(16, 577, 384, 6, True)
    assert not fa.supported_bwd(16, 577, 768, 12, True)
    # 1024² vil_small stage 3 (N=4097, C=384, H=6), RPE
    assert fa.supported_tiled(4, 4097, 384, 6, True)
    assert fa._pick_tile_q(4097, 384, 6, True) == 128
    assert fa.supported_bwd_tiled(4, 4097, 384, 6, True)
    assert fa._pick_tile_q_bwd(4097, 384, 6, True) == 64  # sub-128: legal
    # 1024² stage 4 (N=1025, C=768, H=12), RPE
    assert fa.supported_bwd_tiled(4, 1025, 768, 12, True)
    # forward tiles stay multiples of 128 (lane-axis lse OUT tile)
    for N, C, H in ((4097, 384, 6), (1025, 768, 12), (577, 512, 8)):
        tq = fa._pick_tile_q(N, C, H, True)
        assert tq is None or tq % 128 == 0


@pytest.mark.parametrize("with_bias,H", [(False, 2), (True, 3)])
def test_fused_full_attention_backward_kernel(monkeypatch, with_bias, H):
    """The fused full-attention BACKWARD kernel (r3: LSE-stashed forward,
    one-exp-pass probs, all five GEMMs in VMEM, in-kernel dbias accumulated
    across the batch grid) must match jax.vjp of the XLA reference, and the
    XLA-recompute fallback (pallas_bwd=False) must agree with both."""
    from vil_tpu.ops.pallas import full_attention as fa

    monkeypatch.setattr(fa, "INTERPRET", True)
    B, N, M = 3, 17, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(9), 5)
    q = jax.random.normal(ks[0], (B, N, C)) * 0.5
    k = jax.random.normal(ks[1], (B, N, C)) * 0.5
    v = jax.random.normal(ks[2], (B, N, C))
    bias = jax.random.normal(ks[3], (H, N, N)) * 0.3 if with_bias else None
    g = jax.random.normal(ks[4], (B, N, C))

    def run(fused):
        out, vjp = jax.vjp(lambda *a: fused(*a), q, k, v, bias)
        return out, vjp(g)

    out_f, grads_f = run(fa.make_fused_full_attention(H))
    out_r, grads_r = run(fa.make_fused_full_attention(H, pallas_bwd=False))
    _, vjp_x = jax.vjp(lambda *a: fa._xla_reference(*a, H), q, k, v, bias)
    grads_x = vjp_x(g)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_r), atol=1e-5, rtol=1e-5
    )
    for name, a, b, c in zip(
        ["dq", "dk", "dv", "dbias"], grads_f, grads_r, grads_x
    ):
        if a is None:
            assert b is None
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), atol=5e-5, rtol=5e-5, err_msg=name
        )
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(c), atol=5e-5, rtol=5e-5, err_msg=name
        )


@pytest.mark.parametrize("nglo,with_bias,H", [(1, True, 3), (0, False, 2)])
def test_bf16_scores_flag(monkeypatch, nglo, with_bias, H):
    """VIL_TPU_BF16_SCORES: bf16 end-to-end score tensor (MXU emits bf16,
    comb add / max / exp packed-bf16). Must track the f32 XLA oracle within
    bf16-score tolerance on BOTH grid variants, and the custom-VJP LSE path
    (f32 lse from bf16 m) must keep grads close."""
    B, mx, my, w, M = 2, 3, 3, 3, 8
    C = H * M
    w2 = w * w
    mask_add = vil_kernel.mask_to_additive(
        masks_lib.invalid_mask(mx, my, 1, 2, w, 0, 0), mx, my, w2, nglo
    )
    q, k, v, kg, vg, bias = _random_inputs(
        jax.random.PRNGKey(11), B, mx, my, w, C, nglo, with_bias, H=H
    )
    # tame the score magnitudes like tools/tpu_kernel_smoke.py — at unit
    # scale the bf16 score rounding itself dominates the comparison
    q, k = q * 0.5, k * 0.5
    if kg is not None:
        kg = kg * 0.5
    args_bf = tuple(
        None if a is None else a.astype(jnp.bfloat16)
        for a in (q, k, v, kg, vg)
    )
    out_x = vil_kernel._xla_reference_mh(q, k, v, kg, vg, bias, mask_add, H)
    monkeypatch.setattr(vil_kernel, "BF16_SCORES", True)
    out_p = vil_kernel._pallas_forward_mh(
        *args_bf, bias, mask_add, H, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_x), atol=5e-2
    )
    # row-grid variant with bf16 mask/bias tables
    budget = vil_kernel.WHOLE_IMAGE_VMEM_BYTES
    kv_budget = vil_kernel.KV_RES_VMEM_BYTES
    monkeypatch.setattr(vil_kernel, "WHOLE_IMAGE_VMEM_BYTES", 0)
    monkeypatch.setattr(vil_kernel, "KV_RES_VMEM_BYTES", 0)
    out_row = vil_kernel._pallas_forward_mh(
        *args_bf, bias, mask_add, H, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_row, np.float32), np.asarray(out_x), atol=5e-2
    )
    monkeypatch.setattr(vil_kernel, "WHOLE_IMAGE_VMEM_BYTES", budget)
    monkeypatch.setattr(vil_kernel, "KV_RES_VMEM_BYTES", kv_budget)
    # custom-VJP grads: flag ON (bf16 scores + f32 LSE stash feeding the
    # f32-score backward) vs flag OFF (all-f32 scores) on the SAME bf16
    # inputs — the difference is one bf16 rounding of the forward scores
    fused = vil_kernel.make_fused_vil_attention_mh(mask_add, H)
    diff_bf = tuple(a for a in (*args_bf, bias) if a is not None)

    def grads():
        return jax.grad(
            lambda *a: jnp.sum(fused(*_restore(a, (q, k, v, kg, vg, bias))
                                     ).astype(jnp.float32) ** 2),
            argnums=tuple(range(len(diff_bf))),
        )(*diff_bf)

    g_on = grads()
    monkeypatch.setattr(vil_kernel, "BF16_SCORES", False)
    g_off = grads()
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0.2
        )


def _restore(args, template):
    """Re-insert Nones for absent operands (kg/vg/bias) in template order."""
    it = iter(args)
    return tuple(next(it) if t is not None else None for t in template)


def test_full_attention_bf16_scores_flag(monkeypatch):
    """BF16_SCORES on the dense (s=0 stage) kernels: bf16 forward tracks the
    f32 oracle; fused-backward grads stay consistent with the flag-off bf16
    path (one bf16 rounding of the scores apart)."""
    from vil_tpu.ops.pallas import full_attention as fa
    from vil_tpu.ops.pallas import vil_kernel as vk

    monkeypatch.setattr(fa, "INTERPRET", True)
    B, N, H, M = 2, 17, 3, 8
    C = H * M
    ks = jax.random.split(jax.random.PRNGKey(13), 5)
    q = jax.random.normal(ks[0], (B, N, C)) * 0.5
    k = jax.random.normal(ks[1], (B, N, C)) * 0.5
    v = jax.random.normal(ks[2], (B, N, C))
    bias = jax.random.normal(ks[3], (H, N, N)) * 0.3
    g = jax.random.normal(ks[4], (B, N, C))
    qb, kb, vb, gb = (a.astype(jnp.bfloat16) for a in (q, k, v, g))

    monkeypatch.setattr(vk, "BF16_SCORES", True)
    out_on = fa._pallas_forward(qb, kb, vb, bias, H, interpret=True)
    out_x = fa._xla_reference(q, k, v, bias, H)
    np.testing.assert_allclose(
        np.asarray(out_on, np.float32), np.asarray(out_x), atol=5e-2
    )

    def grads():
        fused = fa.make_fused_full_attention(H)
        _, vjp = jax.vjp(lambda *a: fused(*a), qb, kb, vb, bias)
        return vjp(gb)

    g_on = grads()
    monkeypatch.setattr(vk, "BF16_SCORES", False)
    g_off = grads()
    for a, b in zip(g_on, g_off):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=0.2
        )


def test_full_attention_module_fused_matches_xla(monkeypatch):
    """FullAttention module: fused kernel path ≡ XLA path (same params)."""
    from vil_tpu.models.attention import FullAttention
    from vil_tpu.ops.pallas import full_attention as fa

    monkeypatch.setattr(fa, "INTERPRET", True)
    wx = wy = 4
    nglo, H, C = 1, 2, 16
    N = nglo + wx * wy
    x = jax.random.normal(jax.random.PRNGKey(0), (2, N, C))
    kwargs = dict(dim=C, num_heads=H, nglo=nglo, rpe=True, wx=wx, wy=wy)
    mod_x = FullAttention(use_pallas=False, **kwargs)
    variables = mod_x.init({"params": jax.random.PRNGKey(1)}, x, wx, wy, True)
    out_x = mod_x.apply(variables, x, wx, wy, True)
    mod_p = FullAttention(use_pallas=True, **kwargs)
    out_p = mod_p.apply(variables, x, wx, wy, True)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_x), atol=1e-5, rtol=1e-5
    )
