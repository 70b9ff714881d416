"""Fused Pallas TPU kernel for 2-D sliding-chunk attention.

This is the TPU-native replacement for the reference's external TVM CUDA
kernel (``models.diagonaled_mm_2d``, SURVEY.md §2.9) — and unlike that
kernel, it fuses the ENTIRE local-attention pipeline of
/root/reference/src/models/layers/longformer2d.py:152-200 into one pass:

    scores = q · [k_glo ‖ k_3×3-neighborhood]ᵀ  (+ RPE bias) (+ validity mask)
    probs  = softmax(scores)                     (max-subtracted, f32)
    out    = probs · [v_glo ‖ v_neighborhood]

Design notes (TPU-first):
* Grid is (B·H, mx) — one full ROW of query chunks per step. The three
  neighbor chunk-rows of K/V arrive via cyclically-shifted BlockSpec index
  maps ((i+dx) % mx); the column neighbors are produced in-register by
  cyclic rolls along the row. This amortizes the per-step pipeline overhead
  over my chunks and reads each K/V row 3× (vs 9× for a per-chunk grid), and
  no 9×-materialized neighborhood ever exists in HBM.
* Per query chunk the 9 neighbor K chunks are concatenated in VMEM and
  contracted in ONE wide MXU GEMM (W², M)·(M, 9W²); same for PV.
* Scores/softmax in float32; PV in the input dtype on the MXU.
* RPE bias is per-head (indexed ``bh % H``); the validity mask is an
  additive f32 table (0 / -1e30) covering the global columns too.
* The tiny global-token columns (Nglo ~ 1) use VPU broadcast-reduce — an
  MXU dot with 1 output column is degenerate (and mis-lowers in bf16).
* Masks/bias tables and all shapes are config-time constants ⇒ a single
  compilation per (layer shape, dtype).

The backward pass recomputes through the pure-XLA tier under
``jax.custom_vjp`` (flash-attention-style: the score matrix is never saved).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import sliding_chunk as sc
from ..masks import NEIGHBOR_OFFSETS
from .vil_backward import _stack_bd

# flip to True in CPU tests to run the kernel in interpreter mode
INTERPRET = False

# Experiment flag (default off; A/B via VIL_TPU_LAYOUT_HINT=1): constrain the
# kernel operands/cotangents to the default row-major layout INSIDE the jit,
# asking XLA's layout assignment to materialize the producing QKV-GEMM
# outputs directly in the layout the Pallas custom call pins — instead of
# batch-in-sublanes conv layouts followed by standalone relayout copies
# (~4.9 ms/step at ViL-Small 224 b64; docs/ROADMAP.md "relayout tax").
import os as _os

LAYOUT_HINT = _os.environ.get("VIL_TPU_LAYOUT_HINT", "") == "1"

# Run the softmax exp on bf16 inputs when the kernel computes in bf16 — the
# VPU executes packed bf16 elementwise ops at 2× the f32 rate and the result
# feeds the PV/dV MXU pass with no separate f32→bf16 convert. scores−m ∈
# (−inf, 0]; the probabilities that carry mass sit near 0 where bf16's
# absolute input error is ~1e-3, and the output was already rounded to bf16
# for the MXU either way. Clean serialized A/Bs (docs/BENCHMARKS.md:20) show
# the flag is NEUTRAL on both headlines (inference ON 5645 / OFF 5731, train
# ON 1598 / OFF 1605 — within run-to-run spread); an earlier "+17%" reading
# did not reproduce. Kept default ON as the numerics-safe packing choice
# (compiled max err 5.3e-4 vs 3.6e-4, tools/tpu_kernel_smoke); opt out with
# VIL_TPU_BF16_EXP=0. No throughput win is claimed.
BF16_EXP = _os.environ.get("VIL_TPU_BF16_EXP", "1") == "1"

# Experiment flag (A/B via VIL_TPU_BF16_SCORES=1): keep the FORWARD score
# tensor in bf16 end-to-end when the kernel computes in bf16 — the MXU
# accumulates the QKᵀ dot in f32 internally and rounds ONCE on output, and
# the comb-table add, row max, subtract and exp then all run as packed-bf16
# VPU ops at 2× the f32 rate with half the VMEM traffic. The softmax
# DENOMINATOR still accumulates in f32 from the rounded probs and the
# stashed log-sum-exp stays f32 (m is an exact bf16 value; log(Σp) is f32),
# so the fused backward's math is unchanged. Numerics: one bf16 rounding of
# the scores (~0.4% relative) on top of the existing bf16 prob rounding.
BF16_SCORES = _os.environ.get("VIL_TPU_BF16_SCORES", "0") == "1"


def score_dtype(dtype) -> jnp.dtype:
    """f32, or bf16 for bf16 inputs under the BF16_SCORES experiment."""
    if BF16_SCORES and dtype == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


# TIMING-ONLY ablation knob (VIL_TPU_ABLATE=nocomb|nomax|nosm): structurally
# removes one phase of the fused forward to attribute kernel time (the repo's
# substitute for an in-kernel profiler, which Mosaic does not expose —
# docs/ROADMAP.md). WRONG NUMERICS when set; never enable outside
# kernel-anatomy benchmarks.
#   nocomb — skip the combined bias+mask (or mask/bias) score add
#   nomax  — skip the row-max subtraction (exp of raw scores)
#   nosm   — skip softmax entirely (probs := scores, no exp/sum/divide)
#   noroll — skip the ±1 column-roll slice+concat copies in _nbh_rows
# In-kernel phase tracing (VIL_TPU_KERNEL_TRACE=1): jax.named_scope inside a
# Mosaic kernel lowers to tpu.trace_start/trace_stop on the scope boundaries
# (jax/_src/pallas/mosaic/lowering.py "Insert trace_start and trace_stop ops
# on named_scope boundaries"), so each annotated phase appears as a device
# trace event in a jax.profiler capture — the per-phase kernel anatomy the
# ABLATE knob only approximated. Default OFF: the trace ops execute at
# runtime whether or not a profiler is attached. Consume with
# tools/kernel_trace.py.
KERNEL_TRACE = _os.environ.get("VIL_TPU_KERNEL_TRACE", "0") == "1"


def _scope(name: str):
    """jax.named_scope(name) under VIL_TPU_KERNEL_TRACE, else a no-op."""
    if KERNEL_TRACE:
        return jax.named_scope(name)
    import contextlib

    return contextlib.nullcontext()


ABLATE = _os.environ.get("VIL_TPU_ABLATE", "")
if ABLATE:
    import warnings as _warnings

    _warnings.warn(
        f"VIL_TPU_ABLATE={ABLATE!r} is set: the fused forward kernels now "
        "compute STRUCTURALLY WRONG numerics (timing-only phase ablation). "
        "Every model forward/training result in this process is invalid — "
        "unset it unless running benchmarks/kernel_bench.py anatomy timings.",
        stacklevel=2,
    )


def hint_default_layout(*arrays):
    """with_layout_constraint(default row-major) on each non-None array."""
    if not LAYOUT_HINT:
        return arrays if len(arrays) != 1 else arrays[0]
    from jax.experimental.layout import Layout, with_layout_constraint

    out = tuple(
        a if a is None or getattr(a, "ndim", 0) < 3
        else with_layout_constraint(
            a, Layout(major_to_minor=tuple(range(a.ndim)))
        )
        for a in arrays
    )
    return out if len(out) != 1 else out[0]

# whole-image kernels must fit their VMEM estimate under this budget; the
# pallas_call raises the Mosaic scope to 64 MB, so the budget is that limit
# minus margin. The estimate counts the per-row f32 score temporaries ×mx
# for the UNROLLED variant: Mosaic does not reuse those stack slots across
# a static row unroll (measured: the 14×14 @384 stage-1 APE shape requests
# a 70.45 MB scope = operands + comb + mx × f32-score-row, while the old
# one-row estimate said 23 MB and the compile died at the 64 MB limit).
# Shapes whose unrolled estimate exceeds the budget run the LOOP-rolled
# whole-image kernel (one row's temps live at a time); only shapes whose
# K/V images don't fit at all drop to the row grid (3× K/V HBM reads).
# Tests monkeypatch this to 0 to force the row-grid variant.
WHOLE_IMAGE_VMEM_BYTES = 56 * 2**20

# testing/benchmark knob: force the LOOP-rolled whole-image forward
# (_mh_kernel_img_loop) on (True) or off (False). None = automatic by the
# VMEM estimates above.
FORCE_FWD_LOOP = None

# ring-buffered unrolled whole-image forward (_mh_kernel_img_ring).
# MEASURED DEAD END (r4, default OFF): 3.28 → 3.46 ms at stage-1 shapes.
# The per-row neighborhood concat is LOAD-bound, not copy-bound — Mosaic
# forwards the SSA concat into the GEMM without a VMEM round-trip, so
# replacing 9 part-copies with 3 slot stores + a full scratch re-load adds
# net VMEM traffic (and the phase-tripled comb tables add pressure). Kept
# behind VIL_TPU_RING=1 with parity tests for re-measurement on future
# Mosaic versions.
USE_RING = _os.environ.get("VIL_TPU_RING", "0") == "1"

# K/V-RESIDENT row-streamed tier (_mh_kernel_kv_res): engaged when the full
# whole-image residency (q+k+v+out) overflows WHOLE_IMAGE_VMEM_BYTES but K/V
# alone (+ one row of temporaries) fit this budget — e.g. 1024² stage 1
# (37×37 chunks, ~13 MB per tensor). Keeps the whole-image tier's 1× K/V HBM
# reads instead of the row grid's 3×. The pallas_call raises the Mosaic
# scope to 100 MB for this tier. Tests monkeypatch to 0 to force the row
# grid.
KV_RES_VMEM_BYTES = 88 * 2**20

_NEG_INF = float(np.finfo(np.float32).min) / 2

# CENTER-BLOCK softmax max (r5), INFERENCE path only. The row-max was the
# single most expensive VPU pass of the stage-1 forward (0.87 of 3.28 ms
# device-clock, r4 ablation) — and softmax is shift-invariant: ANY
# overflow-safe subtrahend is exact (the deferred normalization divides it
# out). The 9W²-wide reduce is replaced by a reduce over the W² CENTER-
# block columns (SELF_BLOCK's slice in TAIL order): the self column always
# sits there and is never masked for a valid query, so the center max
# trails the true max by at most the finite score range (~tens). exp then
# runs on min(s − m, CLAMP): for every valid row the clamp is inert
# (gap < CLAMP ⇒ identical math up to the shared shift); it only engages
# on fully-padding query rows whose center block is entirely masked — rows
# whose outputs are discarded — and turns their would-be inf/NaN into
# large-but-finite values (exp(80) ≈ 5.5e34 < f32 max; 442-column f32
# denominators stay ≤ 2.4e37).
#
# MEASURED DEAD END (r5, default OFF). Chip A/Bs, stage-1 kernel_bench +
# model level:
#   variant A (bf16 exp input): 3.278 → 3.151 ms (+4%), inference 6755 →
#     6924 img/s (+2.5%) — but the shifted scores sit at +gap instead of
#     0, where bf16's ABSOLUTE rounding costs ~gap/256 relative prob error
#     (kernel-vs-xla 1.6e-2 → 8.5e-2 at unit scale): a 5× eval-numerics
#     degradation for +2.5%.
#   variant B (f32 exp input, accuracy-neutral): 3.278 → 3.329 ms — the
#     f32 exp pass costs more than the narrowed max reduce saves.
#   train path: −0.9% step A/B, and the extra f32 shifted-score
#     temporaries grew the per-row Mosaic live set past the KV-resident
#     tier's scope at 512² (115 MB vs a 110 MB limit).
# The machinery stays behind VIL_TPU_FAST_MAX=1 (inference/non-LSE path
# only — stashed LSEs are always exact-max so backward one-exp recomputes
# keep z = s − lse ≤ 0 unconditionally) with full parity tests.
FAST_MAX = _os.environ.get("VIL_TPU_FAST_MAX", "0") == "1"
FAST_MAX_CLAMP = 80.0


def _nbh_rows(rows, my: int, extra=None):
    """3 × (my, W2, C) chunk rows → (my, 9W2[+Nglo], C) neighborhood concat
    in NEIGHBOR_OFFSETS order. Column neighbors are STATIC cyclic rolls along
    my via slice+concat (Mosaic's rotate op lacks bf16 support). ``extra``
    (my, Nglo, C) appends the global K rows as a 10th part of the SAME
    concat, so the main GEMM computes the global scores too (kernel v7) —
    note an in-kernel jnp.broadcast_to of (1, Nglo, M) → (my, Nglo, M) is
    NOT an option (Mosaic lowers it as an unsupported gather); the broadcast
    happens XLA-side on the tiny (B, Nglo, C) tensor."""
    with _scope("nbh_concat"):
        parts = []
        for dx, dy in NEIGHBOR_OFFSETS:
            r = rows[dx + 1]
            # ABLATE == "noroll": skip the ±1 column-roll slice+concat copies
            # (6 of 9 parts) — isolates the roll cost in the kernel anatomy
            if dy != 0 and my > 1 and ABLATE != "noroll":
                s = dy % my
                r = jnp.concatenate([r[s:], r[:s]], axis=0)
            parts.append(r)
        if extra is not None:
            parts.append(extra.astype(parts[0].dtype))
        return jnp.concatenate(parts, axis=1)


def _attend_row(q_row, k_cat, v_cat, bias_grp, mask, mask2,
                groups, M: int, out_row, lse_out=None, comb_row=None,
                center_part: int = 4):
    out_ref, out_idx = out_row
    """One chunk-row of fused attention, deferred normalization, head-PAIR
    merged GEMMs (v8).

    q_row (my, W2, C); k_cat/v_cat (my, 9W2+Nglo, C) — the global K *and* V
    rows are appended by _nbh_rows, so BOTH the score and the PV GEMM cover
    the global columns (the v7 per-head VPU broadcast-reduce for the global
    output term is gone — the tiny tail rides the same MXU pass for free).
    ``groups`` (static tuple from vil_backward._head_groups): head PAIRS run
    ONE set of merged GEMMs with block-diagonal stacked operands
    (_stack_bd) — the per-head GEMMs contract K = M = 32 and emit N = M = 32
    lanes, under 10%% of a 128×128 MXU tile; pairing doubles both (the
    forward twin of the backward's pair trick, measured stage-1 bwd
    5.70 → 4.62 ms). ``bias_grp``: per-group pre-stacked bias rows (pair
    rows concatenated on the query axis) | None; ``mask``/``mask2``
    (my, W², cols) / (my, 2W², cols) f32 additive, TAIL order;
    ``comb_row`` = ((combp_ref | None, combs_ref | None), rc): combined
    bias+mask class tables (pair-stacked, vil_backward.pair_comb_tables),
    one VPU add per group. ``out_row``: a WRITABLE (my, W2, C) ref slot —
    per-head results are STORED into their lane slices rather than
    concatenated: the pair-diagonal slices carry a sublane offset (row 49
    of the packed bf16 vregs) that Mosaic's concat lowering rejects
    ("result/input offset mismatch on non-concat dimension") while its
    store path relayouts fine — the exact pattern the backward kernels
    already compile with. ``out_row`` = (ref, index-prefix tuple): fully
    indexed stores, NOT an ``.at[]`` sub-ref view (Mosaic's memref_slice
    rejects the non-aligned view shapes).

    Flash-style deferred normalization: the softmax denominator divides the
    (my, W2, M) OUTPUT rather than the (my, W2, cols) probability tensor —
    ~cols/M fewer divides and one fewer full pass over the score tensor
    (the kernel is VPU-bound, not MXU-bound, at these shapes).

    Global-token columns sit at the TAIL of the score tensor, never the
    front: a front concat forces a 1-lane shift of the whole (W², 9W²)
    tensor (the reference column order is [glo ‖ local]); tail placement
    keeps the big local block at lane offset 0 on both sides.
    """
    C = q_row.shape[-1]
    w2 = q_row.shape[1]
    H = sum(len(g) for g in groups)
    if lse_out is not None:
        del lse_out[:]
        lse_out.extend([None] * H)
    for gidx, grp in enumerate(groups):
        G = len(grp)
        hs = grp[0] * M
        gm = G * M
        q_g = q_row[..., hs : hs + gm]
        k_g = k_cat[..., hs : hs + gm].astype(q_g.dtype)
        q_in = _stack_bd(q_g, M) if G == 2 else q_g
        with _scope("score_gemm"):
            scores = jax.lax.dot_general(
                q_in, k_g, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(score_dtype(q_g.dtype))
        # (my, G·W2, 9W2+Nglo) — bf16 under BF16_SCORES: the MXU accumulator
        # must stay 32-bit (Mosaic rejects bf16 matmul acc), so the rounding
        # is an epilogue cast; the add/max/exp passes then run packed-bf16
        # with half the VMEM traffic (comb/mask tables arrive pre-cast)
        if ABLATE == "nocomb":
            pass  # timing-only: skip the score add
        elif comb_row is not None:
            # combined bias+mask class table: ONE VPU add per group
            # (build_comb / pair_comb_tables); rc is a static int when rows
            # are unrolled, or a traced SMEM read under halo sharding
            (combp_ref, combs_ref), rc = comb_row
            with _scope("score_add"):
                if G == 2:
                    scores = scores + combp_ref[
                        gidx if combp_ref.shape[0] > 1 else 0, rc
                    ]
                else:
                    scores = scores + combs_ref[
                        grp[0] if combs_ref.shape[0] > 1 else 0, rc
                    ]
        else:
            with _scope("score_add"):
                if bias_grp is not None:
                    scores = scores + bias_grp[gidx][None]
                scores = scores + (mask2 if G == 2 else mask)
        fast = FAST_MAX and lse_out is None  # center-block max: inference only
        if ABLATE == "nosm":
            probs = scores.astype(q_g.dtype)
            m = jnp.zeros(scores.shape[:-1] + (1,), jnp.float32)
            denom = jnp.ones(scores.shape[:-1] + (1,), jnp.float32)
        else:
            if ABLATE == "nomax":
                m = jnp.zeros(scores.shape[:-1] + (1,), scores.dtype)
            else:
                with _scope("softmax_max"):
                    # the row-max is the single most expensive VPU pass
                    # (0.92 of 3.33 ms at stage-1 shapes, r4 device-clock
                    # ablation) and softmax is shift-invariant — ANY value
                    # ≥ max-ε is a valid subtrahend. FAST_MAX (r5) reduces
                    # only the W² CENTER-block columns (9× less reduction
                    # work; see the flag comment) — the exp pass clamps the
                    # shifted scores so the rare fully-masked-center padding
                    # rows stay finite. The bf16-cast trick (2 elements per
                    # 32-bit lane slot → half the cross-lane reduction
                    # work) composes with it. f32 inputs (CPU/golden-parity
                    # path) keep the f32 reduce.
                    red = scores
                    if fast:
                        # the SELF block's column slice (the column axis is
                        # shared across a pair's stacked query rows);
                        # ``center_part`` = 4 in TAIL part order, or the
                        # phase-dependent slot in the ring variant
                        red = scores[
                            ..., center_part * w2 : (center_part + 1) * w2
                        ]
                    if (red.dtype == jnp.float32
                            and q_g.dtype == jnp.bfloat16):
                        m = jnp.max(
                            red.astype(jnp.bfloat16), axis=-1,
                            keepdims=True,
                        ).astype(jnp.float32)
                    else:
                        m = jnp.max(red, axis=-1, keepdims=True)
            # unnormalized probs, cast in the same pass as the exp (the f32
            # probability tensor never hits VMEM); denominator accumulates
            # in f32 FROM the rounded probs — consistent with what the PV
            # matmul actually consumes
            with _scope("softmax_exp"):
                shifted = scores - m
                if fast and ABLATE != "nomax":
                    # inert for valid rows (center max trails the true max
                    # by ≪ CLAMP); keeps fully-masked-center padding rows
                    # finite (their outputs are discarded downstream)
                    shifted = jnp.minimum(
                        shifted, jnp.asarray(FAST_MAX_CLAMP, shifted.dtype)
                    )
                # under FAST_MAX the shifted scores are no longer pinned
                # near 0 at the row max (they sit at +gap) — bf16's
                # ABSOLUTE rounding there costs ~gap/256 relative prob
                # error (measured: kernel-vs-xla err 1.6e-2 → 8.5e-2 at
                # unit scale), while the packed-bf16 exp is speed-NEUTRAL
                # (r2 A/B) — so keep the exp input f32 whenever FAST_MAX
                # shifts the window
                if BF16_EXP and q_g.dtype == jnp.bfloat16 and not fast:
                    probs = jnp.exp(shifted.astype(jnp.bfloat16))
                else:
                    probs = jnp.exp(shifted).astype(q_g.dtype)
                denom = jnp.sum(
                    probs, axis=-1, keepdims=True, dtype=jnp.float32
                )
        if lse_out is not None:
            # stash the log-sum-exp L = m + log(Σe) so the backward can
            # recompute normalized probs in a SINGLE exp pass; the log runs
            # on the tiny (my, G·W², 1) denominator
            with _scope("lse_stash"):
                lse_full = (m + jnp.log(denom))[..., 0]  # (my, G·W²) f32
                for j, h in enumerate(grp):
                    lse_out[h] = lse_full[:, j * w2 : (j + 1) * w2]
        v_g = v_cat[..., hs : hs + gm].astype(probs.dtype)
        with _scope("pv_gemm"):
            acc = jax.lax.dot_general(
                probs, v_g, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (my, G·W2, G·M) — for a pair only the diagonal (row block j,
            # lane block j) carries head j's output; the off-diagonal garbage
            # lanes ride the same MXU pass for free
        with _scope("out_store"):
            inv = 1.0 / denom
            for j, h in enumerate(grp):
                out_ref[
                    (*out_idx, slice(None), slice(None),
                     slice(h * M, (h + 1) * M))
                ] = (
                    acc[:, j * w2 : (j + 1) * w2, j * M : (j + 1) * M]
                    * inv[:, j * w2 : (j + 1) * w2]
                ).astype(out_ref.dtype)


def _fwd_groups(num_heads: int, M: int):
    """Head groups for the forward kernels (shared PAIR_HEADS policy)."""
    from .vil_backward import _head_groups

    return _head_groups(num_heads, M)


def _pair_bias_rows(bias_tail, groups):
    """Per-group pre-stacked bias rows ((G·W², cols) each), hoisted out of
    the row loops; None without bias."""
    if bias_tail is None:
        return None
    return [
        jnp.concatenate([bias_tail[g[0]], bias_tail[g[1]]], axis=0)
        if len(g) == 2 else bias_tail[g[0]]
        for g in groups
    ]


def _mh_kernel(nglo: int, w2: int, my: int, num_heads: int, groups,
               has_bias: bool, with_lse: bool, *refs):
    """Row-grid kernel body (grid (B, mx)): blocks carry the FULL channel dim
    C = H·M and head GROUPS are looped in-register (static unroll). This
    keeps the lane dim at C (e.g. 96) for every HBM↔VMEM transfer — the head
    split never materializes outside the kernel. refs:
    [q_row, k_row×3, v_row×3, (kg_row, vg_row)?, (bias_tail)?, mask_row,
    out_row, (lse_row)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_refs = refs[i : i + 3]; i += 3
    v_refs = refs[i : i + 3]; i += 3
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1  # (my, Nglo, C) pre-broadcast XLA-side
        vg_row = refs[i][0]; i += 1
    bias_tail = None
    if has_bias:
        bias_tail = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_out = [] if with_lse else None
    C = q_ref.shape[-1]
    M = C // num_heads
    n_pair = sum(1 for g in groups if len(g) == 2)

    k_nbh = _nbh_rows([kr[0, 0] for kr in k_refs], my, kg_row)
    v_nbh = _nbh_rows([vr[0, 0] for vr in v_refs], my, vg_row)
    mask = mask_ref[0]
    mask2 = jnp.concatenate([mask, mask], axis=1) if n_pair else None
    _attend_row(
        q_ref[0, 0], k_nbh, v_nbh, _pair_bias_rows(bias_tail, groups),
        mask, mask2, groups, M, (out_ref, (0, 0)), lse_out,
    )
    if with_lse:
        lse_ref = refs[i]
        for h in range(num_heads):
            lse_ref[0, h, 0] = lse_out[h]


def _mh_kernel_kv_res(nglo: int, w2: int, mx: int, my: int, num_heads: int,
                      groups, has_bias: bool, with_lse: bool, *refs):
    """K/V-RESIDENT row-streamed kernel body (grid (B, mx)): the full
    per-image K and V are VMEM-resident — their block index maps are
    constant in the row coordinate, so Pallas fetches them from HBM once per
    image and skips the copy on every subsequent row step — while Q/out/mask
    rows stream like the row grid. This is the escape hatch for huge chunk
    grids (1024² stage 1 = 37×37 chunks) where q+k+v+out whole-image
    residency overflows the budget but K/V alone fit: it keeps the
    whole-image tier's 1× K/V HBM reads instead of the row grid's 3×
    (SURVEY §5.7 mech. 1; reference slidingchunk_2d.py:27-130 reads K/V
    once because torch.roll is a view — this tier restores that property at
    sizes the resident kernels can't hold). Rows are addressed dynamically
    via the grid coordinate (cyclic wrap via lax.rem, as the loop-rolled
    kernel does). refs: [q_row, k_img, v_img, (kg_row, vg_row)?,
    (bias_tail)?, mask_row, out_row, (lse_row)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1  # (my, Nglo, C) pre-broadcast XLA-side
        vg_row = refs[i][0]; i += 1
    bias_tail = None
    if has_bias:
        bias_tail = refs[i]; i += 1
    mask_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    C = q_ref.shape[-1]
    M = C // num_heads
    n_pair = sum(1 for g in groups if len(g) == 2)

    i_row = pl.program_id(1)
    mx32 = jnp.int32(mx)  # match program_id's int32 (x64 mode would weak-
    # type a bare python int to int64 and lax.rem rejects mixed dtypes)
    im1 = jax.lax.rem(i_row + mx32 - 1, mx32)
    ip1 = jax.lax.rem(i_row + 1, mx32)
    with _scope("kv_row_load"):
        k_rows = [k_ref[0, im1], k_ref[0, i_row], k_ref[0, ip1]]
        v_rows = [v_ref[0, im1], v_ref[0, i_row], v_ref[0, ip1]]
    lse_out = [] if with_lse else None
    mask = mask_ref[0]
    mask2 = jnp.concatenate([mask, mask], axis=1) if n_pair else None
    _attend_row(
        q_ref[0, 0], _nbh_rows(k_rows, my, kg_row),
        _nbh_rows(v_rows, my, vg_row), _pair_bias_rows(bias_tail, groups),
        mask, mask2, groups, M, (out_ref, (0, 0)), lse_out,
    )
    if with_lse:
        lse_ref = refs[i]
        for h in range(num_heads):
            lse_ref[0, h, 0] = lse_out[h]


def _mh_kernel_img(nglo: int, w2: int, mx: int, my: int, num_heads: int,
                   groups, has_bias: bool, with_lse: bool, class_of,
                   n_comb: int, *refs):
    """Whole-image kernel body (grid (B,)): the ENTIRE per-image Q/K/V
    (mx, my, W², C) is resident in VMEM — viable because a ViL stage's
    feature map is small (e.g. stage 1 of ViL-Small 224: 64 chunks × 49 ×
    96 × bf16 ≈ 600 KB/tensor). Rows are unrolled statically; each K/V row
    is read from HBM ONCE (vs 3× for the row grid) and per-grid-step
    pipeline overhead is amortized mx-fold.

    ``class_of`` (length-mx tuple of static ints) selects the row's slice of
    the combined bias+mask class tables (build_comb + pair_comb_tables;
    ``n_comb`` table refs: [pair table][, odd-head singleton table])."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1  # (my, Nglo, C) pre-broadcast XLA-side
        vg_row = refs[i][0]; i += 1
    bias_tail = mask_ref = None
    comb_refs = ()
    if class_of is not None:
        comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    else:
        if has_bias:
            bias_tail = refs[i]; i += 1
        mask_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None
    C = q_ref.shape[-1]
    M = C // num_heads
    n_pair = sum(1 for g in groups if len(g) == 2)
    comb_pair = _comb_pair_refs(comb_refs, groups) if comb_refs else None
    bias_grp = _pair_bias_rows(bias_tail, groups)

    for i_row in range(mx):
        with _scope("kv_row_load"):
            k_rows = [k_ref[0, (i_row + dx) % mx] for dx in (-1, 0, 1)]
            v_rows = [v_ref[0, (i_row + dx) % mx] for dx in (-1, 0, 1)]
        lse_out = [] if with_lse else None
        mask = mask2 = None
        if mask_ref is not None:
            mask = mask_ref[i_row]
            if n_pair:
                mask2 = jnp.concatenate([mask, mask], axis=1)
        if ABLATE == "nocat":
            # timing-only: GEMM against a WRONG but shape-identical k/v
            # concat hoisted OUT of the row loop (built once per image from
            # row 0) — the per-row concat cost collapses to 1/mx, isolating
            # the neighborhood-concat copies in the anatomy
            if i_row == 0:
                nocat_kv = (
                    _nbh_rows(k_rows, my, kg_row),
                    _nbh_rows(v_rows, my, vg_row),
                )
            k_cat, v_cat = nocat_kv
        else:
            k_cat = _nbh_rows(k_rows, my, kg_row)
            v_cat = _nbh_rows(v_rows, my, vg_row)
        _attend_row(
            q_ref[0, i_row], k_cat, v_cat,
            bias_grp, mask, mask2, groups, M, (out_ref, (0, i_row)), lse_out,
            comb_row=(
                None if comb_pair is None
                else (comb_pair, class_of[i_row])
            ),
        )
        if with_lse:
            for h in range(num_heads):
                lse_ref[0, h, i_row] = lse_out[h]


def _mh_kernel_img_ring(nglo: int, w2: int, mx: int, my: int,
                        num_heads: int, groups, with_lse: bool, class_of,
                        n_comb: int, *refs):
    """RING-buffered whole-image kernel body (grid (B,), rows unrolled).

    The r4 device-clock ablation put the per-row neighborhood concat at
    0.66 ms of the 3.33 ms stage-1 forward — every row rebuilds a
    (my, 9W²+Nglo, C) operand although consecutive rows share 6 of its 9
    parts. Here the operand PERSISTS in two VMEM scratch buffers (k/v):
    column slot b ∈ {0,1,2} holds the three dy-rolls of source row s with
    slot index (s mod 3), the global columns stay pinned at the tail, and
    advancing to the next query row rewrites ONE stale slot (3 part stores
    instead of 9+1 concat copies). The slot→dx-role mapping rotates with the
    row, so the GEMM's score columns come out phase-permuted — softmax and
    the PV contraction are column-order-invariant, and the combined
    bias+mask tables arrive PRE-PERMUTED per phase (wrapper builds 3 phase
    variants; the row's table index is class_of[r]*3 + r%3, still a static
    int). Falls back to _mh_kernel_img when the tripled tables overflow the
    VMEM budget (e.g. RPE bias tables ×H).

    refs: [q, k, v, (kg_row, vg_row)?, comb×n_comb, out, (lse)?,
    k_buf, v_buf] — the trailing two are pallas scratch (my, 9W²+Nglo, C)."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    out_ref = refs[i]; i += 1
    lse_ref = None
    if with_lse:
        lse_ref = refs[i]; i += 1
    k_buf = refs[i]; i += 1
    v_buf = refs[i]; i += 1
    C = q_ref.shape[-1]
    M = C // num_heads
    comb_pair = _comb_pair_refs(comb_refs, groups)

    def fill_slot(src_ref, buf, s: int, b: int):
        """Write source row s's three dy-rolls into column slot b."""
        row = src_ref[0, s]  # (my, W², C)
        for j, dy in enumerate((-1, 0, 1)):
            r = row
            if dy != 0 and my > 1:
                sh = dy % my
                r = jnp.concatenate([r[sh:], r[:sh]], axis=0)
            c0 = (b * 3 + j) * w2
            buf[:, c0 : c0 + w2, :] = r

    with _scope("ring_init"):
        for g in range(3):
            s, b = (g - 1) % mx, (g - 1) % 3
            fill_slot(k_ref, k_buf, s, b)
            fill_slot(v_ref, v_buf, s, b)
        if nglo > 0:
            k_buf[:, 9 * w2 :, :] = kg_row.astype(k_buf.dtype)
            v_buf[:, 9 * w2 :, :] = vg_row.astype(v_buf.dtype)

    for i_row in range(mx):
        lse_out = [] if with_lse else None
        _attend_row(
            q_ref[0, i_row], k_buf[...], v_buf[...],
            None, None, None, groups, M, (out_ref, (0, i_row)), lse_out,
            comb_row=(comb_pair, class_of[i_row] * 3 + i_row % 3),
            # own row i_row sits in slot i_row%3, dy=0 is roll j=1
            center_part=(i_row % 3) * 3 + 1,
        )
        if with_lse:
            for h in range(num_heads):
                lse_ref[0, h, i_row] = lse_out[h]
        if i_row + 1 < mx:
            with _scope("ring_advance"):
                s, b = (i_row + 2) % mx, (i_row + 2) % 3
                fill_slot(k_ref, k_buf, s, b)
                fill_slot(v_ref, v_buf, s, b)


def _ring_phase_tables(tables, w2: int, nglo: int):
    """Pre-permute the comb class tables for the ring kernel's 3 phases.

    For query row r (phase p = r%3), column slot b holds dx-role
    g = (b − r + 1) mod 3, i.e. source row r−1+g. Each phase's table places
    the original dx-block g(b, p) columns at slot b; the global tail stays
    pinned. The phase is folded into the class axis (index = rc·3 + p)."""
    out = []
    for t in tables:
        blocks = [t[..., g * 3 * w2 : (g + 1) * 3 * w2] for g in range(3)]
        glo = t[..., 9 * w2 :]
        phases = []
        for p in range(3):
            cols = [blocks[(b - p + 1) % 3] for b in range(3)] + [glo]
            phases.append(jnp.concatenate(cols, axis=-1))
        # interleave phases on the class axis: index rc*3 + p
        ph = jnp.stack(phases, axis=2)  # (Hc, ncls, 3, my, R, cols)
        s = ph.shape
        out.append(ph.reshape(s[0], s[1] * 3, *s[3:]))
    return out


def _mh_kernel_img_loop(nglo: int, w2: int, mx: int, my: int,
                        num_heads: int, groups, with_lse: bool,
                        n_comb: int, *refs):
    """LOOP-rolled whole-image forward body (grid (B,)) — identical math to
    _mh_kernel_img, but the row loop is a ``lax.fori_loop`` so only ONE
    row's f32 score-sized temporaries are live at a time (Mosaic does not
    reuse stack slots across a static unroll; see _bwd_kernel_img_loop for
    the backward twin). Grids whose unrolled estimate exceeds the budget
    (e.g. 14×14-chunk 384² stage-1) keep the whole-image K/V residency —
    one HBM read per K/V row — instead of dropping to the row grid (3×).

    Traced-row consequences: rows are addressed with dynamic indices
    (cyclic wrap via lax.rem) and the comb-table row class is a traced SMEM
    read. Always runs on the combined bias+mask class tables.

    refs: [q, k, v, (kg_row, vg_row)?, comb×n_comb, rc, out, (lse)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    rc_ref = refs[i]; i += 1  # (mx,) int32 SMEM: traced row classes
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None
    C = q_ref.shape[-1]
    M = C // num_heads
    comb_pair = _comb_pair_refs(comb_refs, groups)

    def body(i_row, carry):
        im1 = jax.lax.rem(i_row + mx - 1, mx)
        ip1 = jax.lax.rem(i_row + 1, mx)
        k_rows = [k_ref[0, im1], k_ref[0, i_row], k_ref[0, ip1]]
        v_rows = [v_ref[0, im1], v_ref[0, i_row], v_ref[0, ip1]]
        lse_out = [] if with_lse else None
        _attend_row(
            q_ref[0, i_row], _nbh_rows(k_rows, my, kg_row),
            _nbh_rows(v_rows, my, vg_row),
            None, None, None, groups, M, (out_ref, (0, i_row)), lse_out,
            comb_row=(comb_pair, rc_ref[i_row]),
        )
        if with_lse:
            for h in range(num_heads):
                lse_ref[0, h, i_row] = lse_out[h]
        return carry

    jax.lax.fori_loop(0, mx, body, 0)


def _comb_pair_refs(comb_refs, groups):
    """(combp_ref | None, combs_ref | None) from the kernel's comb table
    refs: [pair table][, singleton table] when pairs exist, else [full
    table] (mirrors vil_mode_kernel._comb_pair)."""
    n_pair = sum(1 for g in groups if len(g) == 2)
    n_single = sum(1 for g in groups if len(g) == 1)
    it = iter(comb_refs)
    combp = next(it) if n_pair else None
    combs = next(it) if n_single else None
    return combp, combs


def _mh_kernel_img_halo(nglo: int, w2: int, mx: int, my: int,
                        num_heads: int, groups, n_comb: int, with_lse: bool,
                        *refs):
    """Whole-image kernel body over HALO-EXTENDED K/V (grid (B,)) — the
    spatial/sequence-parallel variant (parallel/spatial.py).

    k/v arrive with mx+2 chunk rows: rows 0 and mx+1 are the ±1 halos a
    spatial shard fetched from its mesh neighbors via ppermute, so the row
    loop reads [i, i+1, i+2] with NO cyclic wrap. The combined bias+mask
    row class is a TRACED per-row index (rc_ref, SMEM): different spatial
    shards hold different slices of the global mask, and SPMD shards run one
    program — the static class_of lookup of _mh_kernel_img is not available.
    refs: [q, k_ext, v_ext, (kg_row, vg_row)?, comb×n_comb, rc, out,
    (lse)?]."""
    i = 0
    q_ref = refs[i]; i += 1
    k_ref = refs[i]; i += 1
    v_ref = refs[i]; i += 1
    kg_row = vg_row = None
    if nglo > 0:
        kg_row = refs[i][0]; i += 1
        vg_row = refs[i][0]; i += 1
    comb_refs = tuple(refs[i : i + n_comb]); i += n_comb
    rc_ref = refs[i]; i += 1
    out_ref = refs[i]; i += 1
    lse_ref = refs[i] if with_lse else None
    M = q_ref.shape[-1] // num_heads
    comb_pair = _comb_pair_refs(comb_refs, groups)

    for i_row in range(mx):
        k_rows = [k_ref[0, i_row + dx + 1] for dx in (-1, 0, 1)]
        v_rows = [v_ref[0, i_row + dx + 1] for dx in (-1, 0, 1)]
        lse_out = [] if with_lse else None
        _attend_row(
            q_ref[0, i_row], _nbh_rows(k_rows, my, kg_row),
            _nbh_rows(v_rows, my, vg_row), None, None, None,
            groups, M, (out_ref, (0, i_row)), lse_out,
            comb_row=(comb_pair, rc_ref[i_row]),
        )
        if with_lse:
            for h in range(num_heads):
                lse_ref[0, h, i_row] = lse_out[h]


def _pallas_forward_halo(
    q: jax.Array, k_ext: jax.Array, v_ext: jax.Array,
    k_glo: Optional[jax.Array], v_glo: Optional[jax.Array],
    bias: Optional[jax.Array], classes_host: np.ndarray,
    row_class: jax.Array, num_heads: int,
    *, interpret: Optional[bool] = None,
) -> jax.Array:
    """Whole-image fused forward over halo-extended K/V.

    q (B, mx, my, W², C); k_ext/v_ext (B, mx+2, my, W², C); bias
    (H, W², Nglo+9W²) FRONT order or None; classes_host (ncls, my, Wq, cols)
    TAIL-order mask classes of the GLOBAL grid (host numpy,
    tail_mask_classes); row_class (mx,) int32 — this shard's class per row
    (traced; SMEM operand)."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    cols = nglo + 9 * w2
    if interpret is None:
        interpret = INTERPRET
    bias_tail = None
    if bias is not None:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)
    from .vil_backward import pair_comb_tables

    groups = _fwd_groups(num_heads, C // num_heads)
    comb_tables = [
        t.astype(score_dtype(q.dtype))
        for t in pair_comb_tables(
            build_comb(np.asarray(classes_host, np.float32), bias_tail, w2),
            groups, num_heads,
        )
    ]
    row_class = row_class.astype(jnp.int32)

    img_spec = pl.BlockSpec(
        (1, mx, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    ext_spec = pl.BlockSpec(
        (1, mx + 2, my, w2, C), lambda b: (b, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [img_spec, ext_spec, ext_spec]
    operands = [q, k_ext, v_ext]
    if nglo > 0:
        glo_bcast = pl.BlockSpec((1, my, nglo, C), lambda b: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        in_specs += [glo_bcast, glo_bcast]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    for tbl in comb_tables:
        in_specs.append(
            pl.BlockSpec(tbl.shape, lambda b: (0,) * 5,
                         memory_space=pltpu.VMEM)
        )
        operands.append(tbl)
    in_specs.append(
        pl.BlockSpec((mx,), lambda b: (0,), memory_space=pltpu.SMEM)
    )
    operands.append(row_class)

    kernel = functools.partial(
        _mh_kernel_img_halo, nglo, w2, mx, my, num_heads, groups,
        len(comb_tables), False,
    )
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=img_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * my * w2 * cols * C * 2 * B * mx,
            bytes_accessed=(q.size + 2 * k_ext.size) * q.dtype.itemsize,
            transcendentals=B * mx * my * w2 * cols * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _xla_reference_ext_mh(q, k_ext, v_ext, k_glo, v_glo, bias,
                          mask_add_rows, num_heads):
    """Halo-extended XLA oracle (FRONT column order, like
    _xla_reference_mh): the 3×3 neighbor rows come from static slices of the
    (mx+2)-row K/V instead of cyclic rolls. mask_add_rows: this shard's
    (mx, my, Wq, Nglo+9W²) additive rows."""
    B, mx, my, w2, C = q.shape
    M = C // num_heads
    nglo = 0 if k_glo is None else k_glo.shape[1]

    def to_bh(t):
        b, a1, a2, a3, _ = t.shape
        return (
            t.reshape(b, a1, a2, a3, num_heads, M)
            .transpose(0, 4, 1, 2, 3, 5)
            .reshape(b * num_heads, a1, a2, a3, M)
        )

    def glo_to_bh(t):
        b, g, _ = t.shape
        return (
            t.reshape(b, g, num_heads, M)
            .transpose(0, 2, 1, 3).reshape(b * num_heads, g, M)
        )

    def nbh(t_ext):
        parts = [
            jnp.roll(
                jax.lax.slice_in_dim(t_ext, 1 + dx, 1 + dx + mx, axis=1),
                -dy, axis=2,
            )
            for dx, dy in NEIGHBOR_OFFSETS
        ]
        return jnp.concatenate(parts, axis=3)

    qh = to_bh(q)
    k_nbh = nbh(to_bh(k_ext))
    s_loc = jnp.einsum("bmnlc,bmntc->bmnlt", qh, k_nbh,
                       preferred_element_type=jnp.float32)
    if nglo > 0:
        s_glo = jnp.einsum("bmnlc,btc->bmnlt", qh, glo_to_bh(k_glo),
                           preferred_element_type=jnp.float32)
        scores = jnp.concatenate([s_glo, s_loc], axis=-1)
    else:
        scores = s_loc
    if bias is not None:
        scores = scores + jnp.tile(bias, (B, 1, 1))[:, None, None]
    scores = scores + mask_add_rows.astype(jnp.float32)[None]
    m = jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores - m, axis=-1).astype(q.dtype)
    out = jnp.einsum("bmnlt,bmntc->bmnlc", probs[..., nglo:],
                     nbh(to_bh(v_ext)),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if nglo > 0:
        out = out + jnp.einsum(
            "bmnlt,btc->bmnlc", probs[..., :nglo], glo_to_bh(v_glo),
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    return (
        out.reshape(B, num_heads, mx, my, w2, M)
        .transpose(0, 2, 3, 4, 1, 5)
        .reshape(B, mx, my, w2, C)
    )


def make_fused_vil_attention_halo(
    classes_host: np.ndarray, nglo: int, num_heads: int,
    use_pallas: bool = True,
):
    """Halo-input fused attention with custom VJP — the Pallas path of
    SPATIAL (sequence) parallelism (parallel/spatial.py). Callers exchange
    the ±1 chunk-row halos with ppermute OUTSIDE this boundary and pass
    k_ext/v_ext with mx+2 rows; the VJP emits dk_ext/dv_ext (halo-row grads
    included), which jax transposes back through the caller's
    concat+ppermute automatically.

    classes_host: TAIL-order additive-mask classes of the GLOBAL grid
    (tail_mask_classes); per-shard rows are selected by the traced
    ``row_class`` argument. Backward: the fused whole-image halo kernel
    (vil_backward.backward_whole_image_halo) when its VMEM estimate fits,
    else recompute through the XLA ext oracle."""
    classes_host = np.asarray(classes_host, dtype=np.float32)
    nloc_cols = classes_host.shape[-1] - nglo

    def _mask_front(row_class):
        tail = jnp.asarray(classes_host)[row_class]  # (mx, my, Wq, cols)
        if nglo == 0:
            return tail
        return jnp.concatenate(
            [tail[..., nloc_cols:], tail[..., :nloc_cols]], axis=-1
        )

    def _fits(q, k_ext):
        ncls, my_ = classes_host.shape[:2]
        cols = classes_host.shape[-1]
        w2 = q.shape[3]
        comb_bytes = num_heads * ncls * my_ * w2 * cols * 4
        img_bytes = (
            2 * (2 * q.size + 2 * k_ext.size) // q.shape[0]
            * q.dtype.itemsize  # q/out + k/v ext, ×2 pipeline buffers
            + comb_bytes
            + 3 * my_ * w2 * cols * 4  # live f32 score-row intermediates
        )
        return img_bytes <= WHOLE_IMAGE_VMEM_BYTES

    @jax.custom_vjp
    def fused(q, k_ext, v_ext, k_glo, v_glo, bias, row_class):
        if use_pallas and _fits(q, k_ext):
            return _pallas_forward_halo(
                q, k_ext, v_ext, k_glo, v_glo, bias, classes_host,
                row_class, num_heads,
            )
        return _xla_reference_ext_mh(
            q, k_ext, v_ext, k_glo, v_glo, bias, _mask_front(row_class),
            num_heads,
        )

    def fwd(q, k_ext, v_ext, k_glo, v_glo, bias, row_class):
        out = fused(q, k_ext, v_ext, k_glo, v_glo, bias, row_class)
        return out, (q, k_ext, v_ext, k_glo, v_glo, bias, row_class)

    def _fits_bwd(q, k_ext):
        B, mx, my, w2, _ = q.shape
        cols = classes_host.shape[-1]
        comb_bytes = num_heads * classes_host.shape[0] * my * w2 * cols * 4
        img_bytes = (
            mx * num_heads * 5 * my * w2 * cols * 4  # live f32 score temps
            + (4 * q.size + 4 * k_ext.size) // B * q.dtype.itemsize
            + comb_bytes
            + 2 * (mx + 2) * my * w2 * q.shape[-1] * 4  # dk/dv f32 accs
        )
        from .vil_backward import WHOLE_IMAGE_VMEM_BYTES as BWD_BUDGET

        return img_bytes <= BWD_BUDGET

    def bwd(res, g):
        q, k_ext, v_ext, k_glo, v_glo, bias, row_class = res
        if use_pallas and _fits_bwd(q, k_ext):
            from .vil_backward import backward_whole_image_halo

            dq, dk, dv, dkg, dvg, dbias = backward_whole_image_halo(
                q, k_ext, v_ext, k_glo, v_glo, bias, g, classes_host,
                row_class, num_heads,
            )
            if bias is not None:
                dbias = dbias.astype(bias.dtype)
            return (
                dq, dk, dv,
                dkg if k_glo is not None else None,
                dvg if v_glo is not None else None,
                dbias if bias is not None else None,
                np.zeros(row_class.shape, dtype=jax.dtypes.float0),
            )
        diff = tuple(
            a for a in (q, k_ext, v_ext, k_glo, v_glo, bias)
            if a is not None
        )

        def wrapped(*args):
            it = iter(args)
            full = [next(it) if a is not None else None
                    for a in (q, k_ext, v_ext, k_glo, v_glo, bias)]
            return _xla_reference_ext_mh(
                *full, _mask_front(row_class), num_heads
            )

        _, vjp = jax.vjp(wrapped, *diff)
        grads = iter(vjp(g))
        out = tuple(
            next(grads) if a is not None else None
            for a in (q, k_ext, v_ext, k_glo, v_glo, bias)
        )
        return out + (np.zeros(row_class.shape, dtype=jax.dtypes.float0),)

    fused.defvjp(fwd, bwd)
    return fused


def _pallas_forward_mh(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_glo: Optional[jax.Array],
    v_glo: Optional[jax.Array],
    bias: Optional[jax.Array],
    mask_add: np.ndarray,
    num_heads: int,
    *,
    interpret: Optional[bool] = None,
    with_lse: bool = False,
) -> jax.Array:
    """Multi-head entry: q,k,v (B, mx, my, W², C); k_glo/v_glo (B, Nglo, C);
    bias (H, W², Nglo+9W²) or None. Returns (B, mx, my, W², C); with
    ``with_lse`` returns (out, lse) where lse (B, H, mx, my, W²) f32 is the
    per-query log-sum-exp consumed by the fused backward."""
    B, mx, my, w2, C = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    has_bias = bias is not None
    cols = nglo + 9 * w2
    if interpret is None:
        interpret = INTERPRET

    # the kernel appends the global columns at the TAIL of the score tensor
    # (the global K rows ride the main GEMM operand) — reorder the mask/bias
    # tables here, outside the kernel, where the lane shuffle is free
    wq = w2
    sd = score_dtype(q.dtype)  # table dtype must match the score tensor's
    bias_tail = None
    if has_bias:
        bias_tail = jnp.concatenate(
            [bias[..., nglo:], bias[..., :nglo]], axis=-1
        ).astype(jnp.float32)  # (H, W2, 9W2+Nglo), tail order

    # whole-image kernels take the COMBINED bias+mask row-class table (one
    # in-kernel VPU add per head per row instead of two — see build_comb);
    # the row-grid fallback keeps separate tables (its mask block is indexed
    # by the traced grid row, which can't do the static class lookup)
    classes_host, class_of = tail_mask_classes(np.asarray(mask_add), nglo)
    ncls = classes_host.shape[0]
    comb_bytes = (num_heads if has_bias else 1) * ncls * my * w2 * cols * 4
    groups = _fwd_groups(num_heads, C // num_heads)

    # VMEM estimates for the whole-image variants: q/k/v/out resident (×2
    # for pipeline double-buffering) and the comb table, plus the f32
    # score-row temporaries — ×mx for the statically UNROLLED kernel (Mosaic
    # keeps every unrolled row's stack slots live; calibrated against the
    # observed 70.45 MB scope of the 14×14 @384 stage-1 APE shape), ×1 for
    # the LOOP-rolled kernel (one row live at a time). Whole-image reads K/V
    # once from HBM (vs 3× for the row grid) and amortizes per-step overhead
    # mx-fold; prefer unrolled (static row classes, cheapest addressing),
    # fall back to loop-rolled, and only then to the row grid.
    row_f32 = 3 * my * w2 * cols * 4  # live f32 score-row intermediates
    base_bytes = (
        4 * 2 * q.size // B * q.dtype.itemsize  # q,k,v,out ×2 buffers
        + comb_bytes  # f32 comb table, fully resident
    )
    unrolled_fits = base_bytes + mx * row_f32 <= WHOLE_IMAGE_VMEM_BYTES
    whole_image = base_bytes + row_f32 <= WHOLE_IMAGE_VMEM_BYTES
    use_loop = not unrolled_fits
    if FORCE_FWD_LOOP is not None:
        use_loop = FORCE_FWD_LOOP
    use_loop = whole_image and use_loop
    # RING-buffered unrolled variant (see _mh_kernel_img_ring): persists the
    # neighborhood operand in VMEM scratch, rewriting one slot per row —
    # needs phase-tripled comb tables + the two scratch buffers in budget
    ring = (
        USE_RING
        and whole_image
        and not use_loop
        and base_bytes + 2 * comb_bytes + mx * row_f32
        + 2 * my * cols * C * q.dtype.itemsize
        <= WHOLE_IMAGE_VMEM_BYTES
    )
    mask_tail = None
    comb_tables = []
    if whole_image:
        from .vil_backward import pair_comb_tables

        comb_tables = [
            t.astype(sd)
            for t in pair_comb_tables(
                build_comb(classes_host, bias_tail, w2), groups, num_heads
            )
        ]
        if ring:
            comb_tables = _ring_phase_tables(comb_tables, w2, nglo)
    else:
        class_of = None
        mask_tail = expand_tail_mask(mask_add, nglo, w2).astype(sd)

    # K/V-resident tier estimate: k+v images (×2 pipeline buffers), q/out
    # rows (×2), streamed mask rows (×2), one row's f32 score temporaries
    # (+ the in-kernel pair mask2 concat, covered by row_f32's ×3 slack)
    itemsize = q.dtype.itemsize
    kv_res_bytes = (
        2 * 2 * (k.size // B) * itemsize
        + 4 * 2 * my * w2 * C * itemsize
        + 2 * my * wq * cols * np.dtype(sd).itemsize
        + row_f32
    )
    kv_res = not whole_image and kv_res_bytes <= KV_RES_VMEM_BYTES

    operands = (
        [q, k, v] if whole_image or kv_res else [q, k, k, k, v, v, v]
    )
    if whole_image:
        img_block = (1, mx, my, w2, C)
        img_spec = pl.BlockSpec(
            img_block, lambda b: (b, 0, 0, 0, 0), memory_space=pltpu.VMEM
        )
        in_specs = [img_spec, img_spec, img_spec]
        grid = (B,)
        glo_idx = lambda b: (b, 0, 0)
        const_idx = lambda b: (0, 0, 0)
        out_spec = img_spec
        lse_spec = pl.BlockSpec(
            (1, num_heads, mx, my, w2), lambda b: (b, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if use_loop:
            kernel = functools.partial(
                _mh_kernel_img_loop, nglo, w2, mx, my, num_heads, groups,
                with_lse, len(comb_tables),
            )
        elif ring:
            kernel = functools.partial(
                _mh_kernel_img_ring, nglo, w2, mx, my, num_heads, groups,
                with_lse, class_of, len(comb_tables),
            )
        else:
            kernel = functools.partial(
                _mh_kernel_img, nglo, w2, mx, my, num_heads, groups,
                has_bias, with_lse, class_of, len(comb_tables),
            )
    else:
        row_block = (1, 1, my, w2, C)
        q_spec = pl.BlockSpec(
            row_block, lambda b, i: (b, i, 0, 0, 0), memory_space=pltpu.VMEM
        )

        def row_spec(dx):
            return pl.BlockSpec(
                row_block,
                lambda b, i, dx=dx: (b, (i + dx) % mx, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )

        in_specs = [q_spec]
        if kv_res:
            kv_img_spec = pl.BlockSpec(
                (1, mx, my, w2, C), lambda b, i: (b, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            in_specs += [kv_img_spec, kv_img_spec]
        else:
            in_specs += [row_spec(dx) for dx in (-1, 0, 1)]
            in_specs += [row_spec(dx) for dx in (-1, 0, 1)]
        grid = (B, mx)
        glo_idx = lambda b, i: (b, 0, 0)
        const_idx = lambda b, i: (0, 0, 0)
        mask_spec = pl.BlockSpec(
            (1, my, wq, cols), lambda b, i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = q_spec
        lse_spec = pl.BlockSpec(
            (1, num_heads, 1, my, w2), lambda b, i: (b, 0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if kv_res:
            kernel = functools.partial(
                _mh_kernel_kv_res, nglo, w2, mx, my, num_heads, groups,
                has_bias, with_lse,
            )
        else:
            kernel = functools.partial(
                _mh_kernel, nglo, w2, my, num_heads, groups, has_bias,
                with_lse,
            )

    if nglo > 0:
        # global K AND V rows pre-broadcast over my OUTSIDE the kernel (tiny
        # (B, my, Nglo, C) tensors) — appended to the neighborhood concats
        # so both the score and the PV GEMM cover the global columns (v8)
        kg_spec = pl.BlockSpec(
            (1, my, nglo, C),
            (lambda b: (b, 0, 0, 0)) if whole_image else (
                lambda b, i: (b, 0, 0, 0)
            ),
            memory_space=pltpu.VMEM,
        )
        in_specs += [kg_spec, kg_spec]
        operands += [
            jnp.broadcast_to(k_glo[:, None], (B, my, nglo, C)),
            jnp.broadcast_to(v_glo[:, None], (B, my, nglo, C)),
        ]
    if whole_image:
        for tbl in comb_tables:
            in_specs.append(
                pl.BlockSpec(tbl.shape, lambda b: (0,) * 5,
                             memory_space=pltpu.VMEM)
            )
            operands.append(tbl)
        if use_loop:
            # loop-rolled rows address the comb tables by a traced SMEM
            # row-class read (same pattern as the halo kernel)
            in_specs.append(
                pl.BlockSpec((mx,), lambda b: (0,), memory_space=pltpu.SMEM)
            )
            operands.append(jnp.asarray(class_of, dtype=jnp.int32))
    else:
        if has_bias:
            in_specs.append(
                pl.BlockSpec(
                    (num_heads, w2, cols), const_idx, memory_space=pltpu.VMEM
                )
            )
            operands.append(bias_tail.astype(sd))
        in_specs.append(mask_spec)
        operands.append(jnp.asarray(mask_tail))

    flops_cell = 2 * my * w2 * cols * C * 2
    kv_reads = 3 if whole_image or kv_res else 7
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    if with_lse:
        out_specs = [out_spec, lse_spec]
        out_shape = [
            out_shape,
            jax.ShapeDtypeStruct((B, num_heads, mx, my, w2), jnp.float32),
        ]
    scratch_shapes = (
        [pltpu.VMEM((my, cols, C), q.dtype)] * 2 if ring else []
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_cell * B * mx,
            bytes_accessed=(q.size + kv_reads * k.size) * q.dtype.itemsize,
            transcendentals=B * mx * my * w2 * cols * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(100 if kv_res else 64) * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def _xla_reference_mh(q, k, v, k_glo, v_glo, bias, mask_add, num_heads):
    """Multi-head wrapper over _xla_reference: (B, …, C) → (B·H, …, M)."""
    B, mx, my, w2, C = q.shape
    M = C // num_heads

    def to_bh(t):
        b, a1, a2, a3, _ = t.shape
        return (
            t.reshape(b, a1, a2, a3, num_heads, M)
            .transpose(0, 4, 1, 2, 3, 5)
            .reshape(b * num_heads, a1, a2, a3, M)
        )

    def glo_to_bh(t):
        if t is None:
            return None
        b, g, _ = t.shape
        return (
            t.reshape(b, g, num_heads, M)
            .transpose(0, 2, 1, 3)
            .reshape(b * num_heads, g, M)
        )

    out = _xla_reference(
        to_bh(q), to_bh(k), to_bh(v), glo_to_bh(k_glo), glo_to_bh(v_glo),
        bias, mask_add,
    )
    return (
        out.reshape(B, num_heads, mx, my, w2, M)
        .transpose(0, 2, 3, 4, 1, 5)
        .reshape(B, mx, my, w2, C)
    )


def make_fused_vil_attention_mh(
    mask_add: np.ndarray, num_heads: int, use_pallas: bool = True,
    pallas_bwd: bool = True,
):
    """Multi-head fused attention with custom VJP. Layout (B, mx, my, W², C)
    — no head split outside the kernel. Backward: two-pass Pallas kernels
    (vil_backward) by default, XLA-recompute otherwise."""
    mask_add = np.asarray(mask_add, dtype=np.float32)

    @jax.custom_vjp
    def fused(q, k, v, k_glo, v_glo, bias):
        if use_pallas:
            q, k, v = hint_default_layout(q, k, v)
            return _pallas_forward_mh(
                q, k, v, k_glo, v_glo, bias, mask_add, num_heads
            )
        return _xla_reference_mh(q, k, v, k_glo, v_glo, bias, mask_add, num_heads)

    def fwd(q, k, v, k_glo, v_glo, bias):
        if use_pallas:
            q, k, v = hint_default_layout(q, k, v)
            # train-path forward also stashes the per-query log-sum-exp so
            # the fused backward skips the softmax max/sum/divide recompute
            out, lse = _pallas_forward_mh(
                q, k, v, k_glo, v_glo, bias, mask_add, num_heads,
                with_lse=True,
            )
            return out, (q, k, v, k_glo, v_glo, bias, lse)
        out = _xla_reference_mh(q, k, v, k_glo, v_glo, bias, mask_add, num_heads)
        return out, (q, k, v, k_glo, v_glo, bias, None)

    def bwd(res, g):
        q, k, v, k_glo, v_glo, bias, lse = res
        if use_pallas and pallas_bwd:
            g = hint_default_layout(g)
            from .vil_backward import vil_attention_backward

            dq, dk, dv, dkg, dvg, dbias = vil_attention_backward(
                q, k, v, k_glo, v_glo, bias, g, mask_add, num_heads, lse=lse
            )
            if bias is not None:
                dbias = dbias.astype(bias.dtype)
            return (
                dq, dk, dv,
                dkg if k_glo is not None else None,
                dvg if v_glo is not None else None,
                dbias if bias is not None else None,
            )
        diff_args = tuple(a for a in (q, k, v, k_glo, v_glo, bias) if a is not None)

        def wrapped(*args):
            it = iter(args)
            full = [next(it) if a is not None else None
                    for a in (q, k, v, k_glo, v_glo, bias)]
            return _xla_reference_mh(*full, mask_add, num_heads)

        _, vjp = jax.vjp(wrapped, *diff_args)
        grads = iter(vjp(g))
        return tuple(
            next(grads) if a is not None else None
            for a in (q, k, v, k_glo, v_glo, bias)
        )

    fused.defvjp(fwd, bwd)
    return fused


def _xla_reference(q, k, v, k_glo, v_glo, bias, mask_add):
    """Pure-XLA computation of the same fused attention (used for the
    backward pass and as the CPU fallback). Shapes as in _pallas_forward."""
    BH, mx, my, w2, M = q.shape
    nglo = 0 if k_glo is None else k_glo.shape[1]
    scores_loc = sc.sliding_chunk_qk(q, k, 0)  # (BH, mx, my, W2, 9W2) f32
    if nglo > 0:
        scores_glo = jnp.einsum(
            "bmnlc,btc->bmnlt", q, k_glo, preferred_element_type=jnp.float32
        )
        scores = jnp.concatenate([scores_glo, scores_loc], axis=-1)
    else:
        scores = scores_loc
    if bias is not None:
        H = bias.shape[0]
        B = BH // H
        bias_b = jnp.tile(bias, (B, 1, 1))[:, None, None]  # (BH,1,1,W2,cols)
        scores = scores + bias_b
    scores = scores + jnp.asarray(mask_add, dtype=jnp.float32)[None]
    m = jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
    probs = jax.nn.softmax(scores - m, axis=-1).astype(q.dtype)
    out = sc.sliding_chunk_av(probs[..., nglo:], v, 0)
    if nglo > 0:
        out = out + jnp.einsum(
            "bmnlt,btc->bmnlc", probs[..., :nglo], v_glo,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)
    return out.astype(q.dtype)


def expand_local_mask(mask_add: np.ndarray, nglo: int, w2: int) -> jax.Array:
    """Strip the global columns and expand a blockwise (wq=1) mask table to
    per-query-pixel rows (mx, my, W², 9W²), in bf16, ON DEVICE.

    The kernels add the mask WITHOUT an in-kernel broadcast: broadcasting a
    (my, 1, cols) tile onto the (my, W², cols) MXU output crashes Mosaic's
    vector layout pass (`vector_extract_slice` check failure, observed on
    v5e). The expansion is an XLA broadcast of the SMALL host table — baking
    the expanded table in as a trace-time constant serializes megabytes of
    repeated values into the MLIR program (observed: >150 MB programs and
    HTTP 413s from the remote compiler). The table stays f32: a bf16 mask
    forces a per-use upcast of the whole (W², 9W²) tile inside the kernel,
    measured at +5 ms on stage-1 ViL-Small shapes.
    """
    mx, my = mask_add.shape[:2]
    local = jnp.asarray(mask_add[..., nglo:], dtype=jnp.float32)
    return jnp.broadcast_to(local, (mx, my, w2, local.shape[-1]))


def expand_tail_mask(mask_add: np.ndarray, nglo: int, w2: int) -> jax.Array:
    """Like expand_local_mask, but in the forward kernel's TAIL column order
    [local ‖ glo]: (mx, my, W², 9W²+Nglo) f32, glo columns zero (never
    masked). Same on-device-broadcast rationale as expand_local_mask."""
    mx, my = mask_add.shape[:2]
    tail = np.concatenate([mask_add[..., nglo:], mask_add[..., :nglo]], axis=-1)
    tail_dev = jnp.asarray(tail, dtype=jnp.float32)
    return jnp.broadcast_to(tail_dev, (mx, my, w2, tail.shape[-1]))


def tail_mask_classes(mask_add: np.ndarray, nglo: int):
    """Host-side dedup of the tail-order mask over the mx axis.

    The additive mask varies with the chunk-row index mx only through the
    image-boundary pattern (exact/cyclic padding semantics) — realistic grids
    have ≤4 DISTINCT rows. Returns ``(classes, class_of)``: classes
    (ncls, my, Wq, 9W²+Nglo) f32 host array and a length-mx tuple of static
    ints. The kernels' row loops are statically unrolled, so
    ``class_of[i_row]`` indexes the class table at trace time for free —
    the VMEM-resident table shrinks mx/ncls-fold, and combined with the RPE
    bias (see build_comb) the per-head score adjustment becomes ONE VPU add
    instead of two."""
    tail = np.ascontiguousarray(
        np.concatenate([mask_add[..., nglo:], mask_add[..., :nglo]], axis=-1),
        dtype=np.float32,
    )
    classes, class_of = np.unique(tail, axis=0, return_inverse=True)
    return classes, tuple(int(c) for c in np.asarray(class_of).ravel())


def build_comb(classes_host: np.ndarray, bias_tail: Optional[jax.Array],
               w2: int) -> jax.Array:
    """Combined bias+mask row-class table (Hc, ncls, my, W², cols) f32.

    ``bias_tail`` (H, W², cols) is traced (RPE params), so the add runs
    in-jit each step — ncls·H·my·W²·cols ≈ 1.5M adds, negligible next to the
    kernel's per-(row, head) passes it replaces. Hc = H with bias, else 1."""
    ncls, my, wq, _cols = classes_host.shape
    cls_dev = jnp.asarray(classes_host, dtype=jnp.float32)
    if bias_tail is None:
        return jnp.broadcast_to(
            cls_dev[None], (1, ncls, my, w2, _cols)
        )
    return bias_tail[:, None, None] + cls_dev[None]


def mask_to_additive(mask_bool: np.ndarray, mx: int, my: int, w2: int, nglo: int) -> np.ndarray:
    """Boolean invalid-mask table → additive f32 (mx, my, Wq, Nglo+9W²).

    Global-token columns are never masked. Accepts the (mx·my, 9W²) blockwise
    tables or the (mx·my, W², 9W²) exact table.
    """
    if mask_bool.ndim == 2:
        m = mask_bool.reshape(mx, my, 1, -1)
    else:
        m = mask_bool.reshape(mx, my, w2, -1)
    add = np.where(m, _NEG_INF, 0.0).astype(np.float32)
    if nglo > 0:
        glo = np.zeros(add.shape[:3] + (nglo,), dtype=np.float32)
        add = np.concatenate([glo, add], axis=-1)
    return add
