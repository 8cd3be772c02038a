"""Fused Pallas TPU kernel for CARAFE content-aware reassembly.

The XLA formulation (:func:`cswin_simam_unet_tpu.ops.carafe.carafe_reassemble`)
is correct but bandwidth-bound: the 9-tap accumulation chain materialises an
output-sized f32 buffer repeatedly (measured 67-76 ms fwd+bwd for the final
4x CARAFE at 512^2 batch 16 — ~30% of the whole training step).  These
kernels read x and enc once per row tile, do softmax + 9 shifted FMAs
entirely in VMEM, and write each tile once; the exact backward (softmax VJP
+ tap scatter re-expressed as a gather) runs as a second kernel.

Layout contract: x (B, H, W, C), enc (B, H, W, K^2*S^2) with channel index
``k*S^2 + s`` (reference pixel-shuffle order).  The kernels produce/consume
the *pre-shuffle* (B, H, W, S^2*C) layout; the final pixel-shuffle transpose
(one fused XLA pass) happens outside — Mosaic only supports 2D-friendly
transposes in-kernel.

Grid is (B, H // TH) row tiles.  The 1-row halo is realised by passing the
row-tiled operands three times with index maps clamped at the image edges
(the duplicated edge rows are masked to zero in-kernel).  All accumulation
goes through f32 VMEM scratch refs — long unrolled SSA accumulation chains
blow up Mosaic's scoped-vmem accounting.

Mosaic-layout rules honoured here: no integer indexing into >2D values (use
static channel slices of flat layouts), no reshapes that split/merge an
unaligned lane dim, dynamic slicing only through refs.

Measured dead end (v5e, flagship geometry, 2026-08-18): a C-MAJOR flat
layout (lane c*S^2+s) that shares ONE x-expansion matmul across all 9 taps
(taps = shifts of the expanded tile), turns the backward's per-tap dp
indicator matmuls into contiguous lane folds, and defers dx's s-reduction
to a single end-of-tile matmul — 7x fewer MXU indicator ops on paper —
was SLOWER in practice: bwd 4.4 -> 6.1 ms, fwd 2.24 -> 2.44 ms in-step.
Mosaic overlaps the small indicator matmuls with VPU work almost fully,
while the c-major version pays for deep serial fold chains and 4x more
lane-concat traffic building p-expansions (64 copies of 16 lanes vs 16 of
64).  The s-major layout below is the measured optimum so far.

Assumes ksize == 3 (the model's only configuration).
"""

from __future__ import annotations

import functools

import jax
from jax import lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# the single source of truth for the s-major flat-lane channel order lives
# in ops.windows; these aliases keep this module's historical import surface
from cswin_simam_unet_tpu.ops.windows import (
    pixel_shuffle as _pixel_shuffle,
    pixel_unshuffle as _pixel_unshuffle,
)

_INTERPRET = False


def _row_tile(H: int, W: int, C: int, S: int) -> int:
    """Pick TH so per-tile VMEM stays bounded (halo is single-row blocks, so
    live VMEM ~ TH * per_row + 2 rows; larger TH amortises the halo-row
    softmax recompute in the backward)."""
    # TH sweep at the final-CARAFE geometry (benchmarks/micro_carafe.py,
    # MXU-indicator expansion): fwd+bwd 7.96 ms at TH=4, 12.5 at 8/16 —
    # the 8 MB budget's TH=4 choice is the measured optimum.
    budget = 8 * 1024 * 1024
    per_row = W * (S * S * C + 9 * S * S) * 4 * 2
    for th in (8, 4, 2, 1):
        if H % th == 0 and (th + 2) * per_row <= budget:
            return th
    return 1


def _softmax_taps(enc_tile, K2, S2, out_dtype=jnp.float32):
    """enc (R, W, K2*S2) -> tap-softmaxed probs, same FLAT layout.
    Softmax math in f32; result cast to ``out_dtype`` (the FMA work dtype —
    bf16 inputs keep bf16 compute, halving in-kernel traffic)."""
    e = enc_tile.astype(jnp.float32)
    sl = [e[:, :, k * S2:(k + 1) * S2] for k in range(K2)]
    m = sl[0]
    for t in sl[1:]:
        m = jnp.maximum(m, t)
    ex = [jnp.exp(t - m) for t in sl]
    denom = ex[0]
    for t in ex[1:]:
        denom = denom + t
    return jnp.concatenate([(t / denom).astype(out_dtype) for t in ex],
                           axis=-1)


def _shift_cols(x, dx: int):
    """Shift a (..., W, C) array by dx columns with zero fill (dx in -1,0,1)."""
    if dx == 0:
        return x
    zeros = jnp.zeros_like(x[..., :1, :])
    if dx == 1:  # tap to the right: out(w) = x(w+1)
        return jnp.concatenate([x[..., 1:, :], zeros], axis=-2)
    return jnp.concatenate([zeros, x[..., :-1, :]], axis=-2)


def _row_ext(prev_ref, cur_ref, next_ref, i, ni, dtype=None):
    """(TH+2, W, X) extended rows from the current row tile plus single-row
    halo blocks above/below; the halo rows are zeroed at the image edges
    (their block indices clamp there)."""
    dtype = dtype or cur_ref.dtype
    top = prev_ref[0, -1:].astype(dtype)
    bot = next_ref[0, :1].astype(dtype)
    zero = jnp.zeros((), dtype)
    top = jnp.where(i == 0, zero, top)
    bot = jnp.where(i == ni - 1, zero, bot)
    return jnp.concatenate([top, cur_ref[0].astype(dtype), bot], axis=0)


def _taps(x_ext, TH):
    """The 9 shifted (TH, W, C) tap slabs of a (TH+2, W, C) extended tile."""
    out = []
    for dy in (-1, 0, 1):
        rows = x_ext[1 + dy:1 + dy + TH]
        for dx in (-1, 0, 1):
            out.append(_shift_cols(rows, dx))
    return out


def _expand_s(p_k, C: int):
    """(R, W, S2) -> (R, W, S2*C): each s value repeated across its C-lane
    slot (s-major), i.e. element-wise lane repeat.

    NB: this must NOT be pltpu.repeat — that is a *tile* repeat
    (concatenated copies, lane = rep*S2 + s), which silently produces the
    wrong s-major layout on hardware while interpret-mode tests (which used
    jnp.repeat) pass.  jnp.repeat is also out: its Mosaic lowering needs a
    (.., S2, C) -> (.., S2*C) shape cast that fails for lane-UNaligned C
    (the final 4x head has C=64) and a 16-bit minor-dim insertion that
    fails for bf16.  Per-slot lane broadcasts + concat lower correctly for
    every (geometry, dtype) the model uses — verified on hardware in
    tests/test_tpu_numerics.py."""
    if _INTERPRET:
        return jnp.repeat(p_k, C, axis=-1)
    R, W, S2 = p_k.shape
    # expansion as an indicator matmul E[s, s*C + c] = 1: the MXU builds
    # the s-major layout while the VPU does the useful FMA work.  Exact:
    # 0/1 entries, bf16 products of bf16 values, f32 accumulate.
    ind = (lax.broadcasted_iota(jnp.int32, (S2, S2 * C), 1) // C
           == lax.broadcasted_iota(jnp.int32, (S2, S2 * C), 0)
           ).astype(p_k.dtype)
    # DEFAULT precision would round f32 p values to bf16 in the single MXU
    # pass; HIGHEST keeps the expansion exact (bf16 operands are exact at
    # DEFAULT, and HIGHEST does not lower for them)
    prec = (lax.Precision.HIGHEST if p_k.dtype == jnp.float32
            else lax.Precision.DEFAULT)
    y = lax.dot_general(p_k.reshape(R * W, S2), ind,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
    return y.reshape(R, W, S2 * C).astype(p_k.dtype)


def _tile_c(xk, S2: int):
    """(R, W, C) -> (R, W, S2*C): the C-lane vector tiled S2 times."""
    return jnp.concatenate([xk] * S2, axis=-1)


def _fold_sum_s(m, S2: int, C: int):
    """(R, W, S2*C) -> (R, W, C): sum the S2 s-slots of the s-major lane
    layout by log2 halving folds (contiguous half-lane adds), instead of S2
    single-lane broadcast FMAs."""
    width = S2 * C
    while width > C:
        width //= 2
        m = m[..., :width] + m[..., width:2 * width]
    return m


def _fwd_kernel(xp_ref, xc_ref, xn_ref, enc_ref, o_ref, *,
                S: int, TH: int, W: int, C: int):
    K2, S2 = 9, S * S
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    work = xc_ref.dtype
    p = _softmax_taps(enc_ref[0], K2, S2, work)       # (TH, W, 9*S2) flat
    x_ext = _row_ext(xp_ref, xc_ref, xn_ref, i, ni)   # (TH+2, W, C)
    xk = _taps(x_ext, TH)                             # 9 x (TH, W, C)

    # lane-tiled accumulation: per tap ONE wide FMA over all S2 slots
    # (acc lane s*C + c  +=  p[k, s] * x_k[c])
    acc = None
    for k in range(K2):
        pk = _expand_s(p[:, :, k * S2:(k + 1) * S2], C)  # (TH, W, S2*C)
        term = pk * _tile_c(xk[k], S2)
        acc = term if acc is None else acc + term
    o_ref[0] = acc.astype(o_ref.dtype)


def _bwd_kernel(xp_ref, xc_ref, xn_ref, enc_ref, encp_ref, encn_ref,
                da_ref, dap_ref, dan_ref, dx_ref, denc_ref, *,
                S: int, TH: int, W: int, C: int):
    K2, S2 = 9, S * S
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    work = xc_ref.dtype
    # one softmax over the extended rows serves BOTH the local-row dp/denc
    # math (rows 1..TH+1 equal the local softmax bitwise — softmax mixes
    # nothing across rows) and the dx gather below (round-4 trim)
    p_ext = _row_ext(encp_ref, enc_ref, encn_ref, i, ni, jnp.float32)
    p_ext = _softmax_taps(p_ext, K2, S2, work)    # (TH+2, W, 9*S2)
    p = p_ext[1:TH + 1]                           # (TH, W, 9*S2)
    x_ext = _row_ext(xp_ref, xc_ref, xn_ref, i, ni)   # (TH+2, W, C)
    xk = _taps(x_ext, TH)                             # 9 x (TH, W, C)
    da = da_ref[0].astype(work)                       # (TH, W, S2*C)

    # ---- denc: softmax VJP over taps (local rows) ----
    # dp_k(r,w,s) = sum_c dacc(r,w,s,c) * xk(r,w,c).  The per-(k,s) lane
    # reductions are the VPU-killer; instead reduce all S2 slots at once on
    # the MXU against a (S2*C, S2) block-indicator matrix.
    ind = (lax.broadcasted_iota(jnp.int32, (S2 * C, S2), 0) // C
           == lax.broadcasted_iota(jnp.int32, (S2 * C, S2), 1)
           ).astype(work)
    da2 = da.reshape(TH * W, S2 * C)
    # f32 operands at DEFAULT precision run ONE bf16 MXU pass (~1e-3 rel
    # error on denc); HIGHEST restores exact f32.  bf16 operands are exact
    # at DEFAULT already (bf16 x bf16 -> f32 accumulate) and HIGHEST does
    # not lower for them in Mosaic ("Bad lhs type").
    mm_prec = (lax.Precision.HIGHEST if da2.dtype == jnp.float32
               else lax.Precision.DEFAULT)
    dp = []  # K2 entries of (TH, W, S2)
    for k in range(K2):
        t = da2 * _tile_c(xk[k], S2).reshape(TH * W, S2 * C)
        dpk = lax.dot_general(t, ind, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=mm_prec)
        dp.append(dpk.reshape(TH, W, S2))
    inner = dp[0] * p[:, :, 0:S2]
    for k in range(1, K2):
        inner = inner + dp[k] * p[:, :, k * S2:(k + 1) * S2]
    denc = jnp.concatenate(
        [p[:, :, k * S2:(k + 1) * S2] * (dp[k] - inner) for k in range(K2)],
        axis=-1)
    denc_ref[0] = denc.astype(denc_ref.dtype)

    # ---- dx: gather over the 1-row halo ----
    # dx(r,w,c) = sum_k q_k(r - Dy, w - Dx, c),
    #   q_k(r,w,c) = sum_s p_k(r,w,s) * dacc(r,w,s,c)
    # NB: p_ext's halo rows are softmaxed all-zero logits -> uniform probs,
    # but their dacc is zero so they contribute 0.
    dacc_ext = _row_ext(dap_ref, da_ref, dan_ref, i, ni)  # (TH+2, W, S2*C)

    dx = None
    k = 0
    for dy in (-1, 0, 1):
        # q rows needed: r - dy for local r -> ext rows (1 - dy) .. (TH - dy)
        p_rows = p_ext[1 - dy:1 - dy + TH]
        dacc_rows = dacc_ext[1 - dy:1 - dy + TH]
        for dx_ in (-1, 0, 1):
            # q_k(r,w,c) = sum_s p_k(r,w,s) * dacc(r,w,s*C+c): expand p_k to
            # the s-major lanes, one wide multiply, then log2 lane folds —
            # S2 single-lane broadcast FMAs per tap were the VPU bottleneck
            base = k * S2
            m = _expand_s(p_rows[:, :, base:base + S2], C) * dacc_rows
            q = _fold_sum_s(m, S2, C)
            # out(w') consumed x at w'+dx_, so dx(w) += q(w - dx_)
            contrib = _shift_cols(q, -dx_)
            dx = contrib if dx is None else dx + contrib
            k += 1
    dx_ref[0] = dx.astype(dx_ref.dtype)




def _tiled_specs(TH, W, CH, nR):
    """(cur, prev, next) row-tile specs with edge-clamped halo maps.

    prev/next are SINGLE-ROW blocks (the kernels use exactly one halo row
    each side) — fetching the full neighbour tile tripled HBM traffic on the
    widest operand (the S^2*C cotangent) for rows that were thrown away.
    Their index maps are in single-row units (block height 1)."""
    H = nR * TH
    cur = pl.BlockSpec((1, TH, W, CH), lambda b, i: (b, i, 0, 0),
                       memory_space=pltpu.VMEM)
    prev = pl.BlockSpec((1, 1, W, CH),
                        lambda b, i: (b, jnp.maximum(i * TH - 1, 0), 0, 0),
                        memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 1, W, CH),
                       lambda b, i: (b, jnp.minimum((i + 1) * TH, H - 1),
                                     0, 0),
                       memory_space=pltpu.VMEM)
    return cur, prev, nxt


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def carafe_flat_pallas(x, enc, up_factor: int, ksize: int = 3):
    """Fused CARAFE reassembly in *pre-pixel-shuffle* layout: returns
    (B, H, W, S^2*C) with lane slot s*C + c = sub-pixel s of channel c.
    Consumers that commute with pixel-shuffle (1x1 convs as S^2-grouped
    tiled convs, SimAM via :func:`ops.simam.simam_flat`) can stay in this
    layout and skip the expensive full-resolution transpose entirely."""
    return _carafe_fwd_impl(x, enc, up_factor, ksize)


def carafe_reassemble_pallas(x, enc, up_factor: int, ksize: int = 3):
    """Fused CARAFE reassembly; drop-in for
    :func:`cswin_simam_unet_tpu.ops.carafe.carafe_reassemble` (ksize 3)."""
    return _pixel_shuffle(carafe_flat_pallas(x, enc, up_factor, ksize),
                          up_factor)


def _carafe_fwd_impl(x, enc, up_factor, ksize):
    assert ksize == 3, "pallas CARAFE kernel supports ksize=3"
    B, H, W, C = x.shape
    S = up_factor
    TH = _row_tile(H, W, C, S)
    nR = H // TH
    K2S2 = 9 * S * S
    x_cur, x_prev, x_next = _tiled_specs(TH, W, C, nR)
    enc_cur, _, _ = _tiled_specs(TH, W, K2S2, nR)
    acc_cur, _, _ = _tiled_specs(TH, W, S * S * C, nR)
    kernel = functools.partial(_fwd_kernel, S=S, TH=TH, W=W, C=C)
    acc = pl.pallas_call(
        kernel,
        grid=(B, nR),
        in_specs=[x_prev, x_cur, x_next, enc_cur],
        out_specs=acc_cur,
        out_shape=jax.ShapeDtypeStruct((B, H, W, S * S * C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * S * S * C,
            transcendentals=B * H * W * 9 * S * S,
            bytes_accessed=(x.size + enc.size + B * H * W * S * S * C) * 2),
        interpret=_INTERPRET,
    )(x, x, x, enc)
    return acc


def _carafe_fwd(x, enc, up_factor, ksize):
    return _carafe_fwd_impl(x, enc, up_factor, ksize), (x, enc)


def _carafe_bwd(up_factor, ksize, residuals, dacc):
    # NB: cotangent arrives in the flat pre-shuffle layout
    x, enc = residuals
    B, H, W, C = x.shape
    S = up_factor
    TH = _row_tile(H, W, C, S)
    nR = H // TH
    K2S2 = 9 * S * S
    x_cur, x_prev, x_next = _tiled_specs(TH, W, C, nR)
    enc_cur, enc_prev, enc_next = _tiled_specs(TH, W, K2S2, nR)
    da_cur, da_prev, da_next = _tiled_specs(TH, W, S * S * C, nR)
    kernel = functools.partial(_bwd_kernel, S=S, TH=TH, W=W, C=C)
    dx, denc = pl.pallas_call(
        kernel,
        grid=(B, nR),
        in_specs=[x_prev, x_cur, x_next, enc_cur, enc_prev, enc_next,
                  da_cur, da_prev, da_next],
        out_specs=[x_cur, enc_cur],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(enc.shape, enc.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * 9 * B * H * W * S * S * C,
            transcendentals=3 * B * H * W * 9 * S * S,
            bytes_accessed=(x.size + 2 * enc.size
                            + 2 * B * H * W * S * S * C) * 2),
        interpret=_INTERPRET,
    )(x, x, x, enc, enc, enc, dacc, dacc, dacc)
    return dx, denc


carafe_flat_pallas.defvjp(_carafe_fwd, _carafe_bwd)
