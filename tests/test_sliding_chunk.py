"""Oracle tests: sliding-chunk attention vs a naive dense masked reference.

Reproduces the reference test strategy (SURVEY.md §4,
/root/reference/src/tests/test_slidingchunk_2d.py): a brute-force dense
attention with an independently-derived validity mask is the ground truth;
the fast path must match it on forward output and q/k/v gradients.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vil_tpu.ops import masks as M
from vil_tpu.ops import sliding_chunk as SC

jax.config.update("jax_enable_x64", True)


def dense_allowed_mask(nx, ny, w, exact, mode=0):
    """Brute-force allowed(query, key) over the PADDED grid, True = allowed.

    Independent re-derivation (nested loops) of the three masking semantics;
    intentionally slow and simple.
    """
    padx, pady, mx, my = SC.chunk_grid(nx, ny, w)
    X, Y = mx * w, my * w
    allowed = np.zeros((X * Y, X * Y), dtype=bool)
    if mode == 0:
        offsets = M.NEIGHBOR_OFFSETS
    elif mode == -1:
        offsets = [(0, 0)]
    else:
        dx_dy = {1: (-1, -1), 2: (-1, 0), 3: (-1, 1), 4: (0, -1),
                 5: (0, 1), 6: (1, -1), 7: (1, 0), 8: (1, 1)}[mode]
        offsets = [(0, 0), dx_dy]
    for qx in range(X):
        for qy in range(Y):
            qi = qx * Y + qy
            cqx, cqy = qx // w, qy // w
            for kx in range(X):
                for ky in range(Y):
                    ki = kx * Y + ky
                    ckx, cky = kx // w, ky // w
                    if exact == 1:
                        # pad keys never allowed; ±w box clipped to the image
                        ok = (kx < nx and ky < ny
                              and abs(kx - qx) <= w and abs(ky - qy) <= w)
                    elif exact == 0:
                        ok = (kx < nx and ky < ny
                              and (ckx - cqx, cky - cqy) in offsets)
                    else:
                        # cyclic: pad keys ARE attended (as zero-k/v slots)
                        # when reached via wrap-around; they are masked only
                        # when their chunk is the natural (unwrapped)
                        # last-row/col neighbor — reference semantics
                        # (slidingchunk_2d.py:250-267).
                        ok = False
                        for dx, dy in offsets:
                            if ((cqx + dx) % mx, (cqy + dy) % my) != (ckx, cky):
                                continue
                            masked = (
                                cqx + dx == mx - 1 and kx % w >= w - padx
                            ) or (cqy + dy == my - 1 and ky % w >= w - pady)
                            ok = ok or not masked
                    allowed[qi, ki] = ok
    return allowed


def dense_attention(q, k, v, allowed):
    """Ground truth: full QKᵀ, -inf masking, max-subtracted softmax, PV."""
    scores = jnp.einsum("bnc,btc->bnt", q, k)
    scores = jnp.where(jnp.asarray(allowed)[None], scores, -jnp.inf)
    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnt,btc->bnc", probs, v)


def sliding_attention(q, k, v, nx, ny, w, exact, mode=0):
    """The fast path: chunked qk → static mask → softmax → av → unchunk."""
    padx, pady, mx, my = SC.chunk_grid(nx, ny, w)
    qc = SC.chunkify(q, nx, ny, w)
    kc = SC.chunkify(k, nx, ny, w)
    vc = SC.chunkify(v, nx, ny, w)
    scores = SC.sliding_chunk_qk(qc, kc, mode)
    mask = M.invalid_mask(mx, my, padx, pady, w, exact, mode if isinstance(mode, int) else 0)
    if mask.ndim == 2:  # (mx*my, kv) -> broadcast over query pixels
        mask_b = jnp.asarray(mask).reshape(1, mx, my, 1, -1)
    else:  # exact: (mx*my, w2, kv)
        mask_b = jnp.asarray(mask).reshape(1, mx, my, w * w, -1)
    scores = jnp.where(mask_b, -jnp.inf, scores)
    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = jax.nn.softmax(scores, axis=-1)
    out = SC.sliding_chunk_av(probs, vc, mode)
    return SC.unchunkify(out, nx, ny, w)


def crop_real(dense_out, nx, ny, w):
    """Dense output lives on the padded grid; crop to real tokens."""
    padx, pady, mx, my = SC.chunk_grid(nx, ny, w)
    X, Y = mx * w, my * w
    b, n, c = dense_out.shape
    return dense_out.reshape(b, X, Y, c)[:, :nx, :ny].reshape(b, nx * ny, c)


def pad_tokens(t, nx, ny, w):
    """Zero-pad (B, nx*ny, M) tokens onto the padded grid, flattened."""
    padx, pady, mx, my = SC.chunk_grid(nx, ny, w)
    b, n, c = t.shape
    g = t.reshape(b, nx, ny, c)
    g = jnp.pad(g, ((0, 0), (0, padx), (0, pady), (0, 0)))
    return g.reshape(b, (nx + padx) * (ny + pady), c)


# NOTE: cyclic padding (exact=-1) is only tested on grids with >=3 chunks per
# axis: at mx<3 the cyclic roll maps the -1 and +1 neighbors onto the same
# chunk and the key is counted twice in the softmax — the reference
# implementation has the identical degeneracy (its tests use mx=5 grids).
@pytest.mark.parametrize(
    "exact,nx,ny,w",
    [(0, 8, 8, 4), (0, 10, 9, 4), (0, 7, 7, 4),
     (1, 8, 8, 4), (1, 10, 9, 4), (1, 7, 7, 4),
     (-1, 12, 12, 4), (-1, 10, 9, 4), (-1, 9, 13, 3)],
)
def test_forward_matches_dense(exact, nx, ny, w):
    rng = np.random.default_rng(0)
    B, Mdim = 2, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, nx * ny, Mdim)), dtype=jnp.float64)
        for _ in range(3)
    )
    fast = sliding_attention(q, k, v, nx, ny, w, exact)
    allowed = dense_allowed_mask(nx, ny, w, exact)
    dense = dense_attention(
        pad_tokens(q, nx, ny, w), pad_tokens(k, nx, ny, w), pad_tokens(v, nx, ny, w),
        allowed,
    )
    dense = crop_real(dense, nx, ny, w)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-10)


@pytest.mark.parametrize("mode", [-1, 1, 3, 5, 8])
@pytest.mark.parametrize("exact", [0, -1])
def test_modes_match_dense(mode, exact):
    nx = ny = 12  # mx=my=3: no cyclic wrap degeneracy (see note above)
    w = 4
    rng = np.random.default_rng(1)
    B, Mdim = 2, 8
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, nx * ny, Mdim)), dtype=jnp.float64)
        for _ in range(3)
    )
    fast = sliding_attention(q, k, v, nx, ny, w, exact, mode)
    allowed = dense_allowed_mask(nx, ny, w, exact, mode)
    dense = crop_real(
        dense_attention(
            pad_tokens(q, nx, ny, w), pad_tokens(k, nx, ny, w),
            pad_tokens(v, nx, ny, w), allowed,
        ),
        nx, ny, w,
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(dense), atol=1e-10)


def test_traced_mode_matches_static():
    """Random-shift path: a traced mode index must equal the static builds."""
    nx = ny = 8
    w = 4
    padx, pady, mx, my = SC.chunk_grid(nx, ny, w)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, mx, my, w * w, 8)))
    k = jnp.asarray(rng.standard_normal((2, mx, my, w * w, 8)))

    @jax.jit
    def traced_qk(q, k, mode):
        return SC.sliding_chunk_qk(q, k, mode)

    for mode in range(1, 9):
        static = SC.sliding_chunk_qk(q, k, mode)
        traced = traced_qk(q, k, jnp.int32(mode))
        np.testing.assert_allclose(np.asarray(traced), np.asarray(static), atol=1e-12)


def test_gradients_match_dense():
    nx = ny = 8
    w = 4
    exact = 0
    rng = np.random.default_rng(3)
    B, Mdim = 1, 4
    q, k, v = (
        jnp.asarray(rng.standard_normal((B, nx * ny, Mdim)), dtype=jnp.float64)
        for _ in range(3)
    )
    allowed = dense_allowed_mask(nx, ny, w, exact)
    gref = jnp.asarray(rng.standard_normal((B, nx * ny, Mdim)))

    def loss_fast(q, k, v):
        return jnp.sum(sliding_attention(q, k, v, nx, ny, w, exact) * gref)

    def loss_dense(q, k, v):
        out = crop_real(
            dense_attention(
                pad_tokens(q, nx, ny, w), pad_tokens(k, nx, ny, w),
                pad_tokens(v, nx, ny, w), allowed,
            ),
            nx, ny, w,
        )
        return jnp.sum(out * gref)

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-10)


def test_rpe_index_bounds():
    from vil_tpu.ops import rpe

    for w in (2, 3, 7):
        idx = rpe.sliding_chunk_rpe_index(w)
        assert idx.shape == (w * w, 9 * w * w)
        assert idx.min() >= 0 and idx.max() < (4 * w - 1) ** 2
        # self-attention (same pixel) maps to the center table entry
        center = (2 * w - 1) * (4 * w - 1) + (2 * w - 1)
        w2 = w * w
        for l in range(w2):
            assert idx[l, 4 * w2 + l] == center
    idx = rpe.full_rpe_index(3, 4)
    assert idx.shape == (12, 12)
    assert idx.min() >= 0 and idx.max() < 5 * 7
    assert np.all(np.diag(idx) == idx[0, 0])
