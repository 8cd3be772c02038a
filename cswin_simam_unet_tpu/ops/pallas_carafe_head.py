"""Fully-fused final segmentation head: CARAFE 4x reassembly -> out-conv
bias -> SimAM gate -> grouped 1x1 head dot as ONE custom-VJP op.

At the 512^2 flagship geometry the pre-pixel-shuffle CARAFE output is
(8, 128, 128, 1024) bf16 = 268 MB.  The previous composition
(:func:`ops.pallas_carafe.carafe_flat_pallas` + bias/SimAM/head in
:func:`ops.pallas_simam_head.simam_head`) still walked it five extra times
around the kernel boundaries: a full stats read in forward (XLA kLoop), and
in backward a full-size ``dacc`` cotangent written by the head's
elementwise pass then re-read (with row halos) by the CARAFE backward —
measured ~9.7 ms of the 52.6 ms train step for the whole chain.  This op
removes both:

  fwd  K1: reassembly kernel also ADDS the out-conv bias (same bf16 add the
           head used to do) and emits per-tile raw moments (sum, sum^2) of
           the biased map — the stats read disappears.      [flat: 1 write]
       K2: the existing head forward (gate + kron(I_G, W) dot) consuming
           the precomputed stats.                            [flat: 1 read]
  bwd  K3: the existing head reduction pass (A, B, dW partials).  [1 read]
       K4: ONE kernel recomputes the head's elementwise VJP (``dacc``) in
           VMEM — including the one-row halo, from the stored flat map's
           halo rows — and feeds it straight into the CARAFE softmax-VJP /
           tap-gather backward.  The 268 MB ``dacc`` round-trip (write +
           halo-tiled re-read) never touches HBM.     [flat: 1 haloed read]

Numerics are IDENTICAL by construction to the unfused pair: the bias add
happens in the compute dtype on the same accumulator values, the moments
are the same f32 sums (per-tile partials, pooled per real channel exactly
like ``ops.simam._flat_stats``), K2/K3 are literally the same kernels, and
K4 casts ``dacc`` through the compute dtype at the same point the old
chain stored it to HBM.  See tests/test_carafe_head.py (oracle parity,
fwd + all four gradients, interpret mode) and the hardware lowering run in
tests/test_tpu_numerics.py.

Reference context: CARAFE4 + the final 1x1 conv of
train_cswinunet_segmentation.py:440-486,:674-682 (SimAM itself is absent
from the reference; SURVEY.md preamble).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_simam_unet_tpu.ops.pallas_carafe import (
    _expand_s,
    _fold_sum_s,
    _row_ext,
    _row_tile,
    _shift_cols,
    _softmax_taps,
    _taps,
    _tile_c,
    _tiled_specs,
)
from cswin_simam_unet_tpu.ops.pallas_simam_head import (
    _kron_eye,
    _mm,
    _row8,
    head_bwd1_pallas,
    head_fwd_pallas,
)

_INTERPRET = False


# ---------------------------------------------------------------------------
# forward: reassembly + bias + moments (K1)
# ---------------------------------------------------------------------------

def _fwd_moments_kernel(xp_ref, xc_ref, xn_ref, enc_ref, bias_ref,
                        fb_ref, s1_ref, s2_ref, *,
                        S: int, TH: int, W: int, C: int, gate: bool):
    """ops.pallas_carafe._fwd_kernel + the out-conv bias add (in the output
    dtype — bitwise the add the unfused head performed on the stored map)
    + per-tile raw moments of the biased map (f32, sublane-padded rows)."""
    K2, S2 = 9, S * S
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    work = xc_ref.dtype
    p = _softmax_taps(enc_ref[0], K2, S2, work)       # (TH, W, 9*S2) flat
    x_ext = _row_ext(xp_ref, xc_ref, xn_ref, i, ni)   # (TH+2, W, C)
    xk = _taps(x_ext, TH)                             # 9 x (TH, W, C)

    acc = None
    for k in range(K2):
        pk = _expand_s(p[:, :, k * S2:(k + 1) * S2], C)  # (TH, W, S2*C)
        term = pk * _tile_c(xk[k], S2)
        acc = term if acc is None else acc + term
    fb = acc.astype(fb_ref.dtype) + bias_ref[...]
    fb_ref[0] = fb
    if gate:
        f = fb.astype(jnp.float32)
        s1_ref[0, 0] = _row8(jnp.sum(f, axis=(0, 1)), S2 * C)
        s2_ref[0, 0] = _row8(jnp.sum(f * f, axis=(0, 1)), S2 * C)
    else:
        s1_ref[0, 0] = jnp.zeros((8, S2 * C), jnp.float32)
        s2_ref[0, 0] = jnp.zeros((8, S2 * C), jnp.float32)


def _carafe_biased_moments(x, enc, bias_t, S, gate, interpret):
    """(flat_biased, mu, v): the biased pre-shuffle map plus its pooled
    per-real-channel SimAM statistics as (B, S^2*C) f32 (gate=False returns
    zero stats)."""
    B, H, W, C = x.shape
    TH = _row_tile(H, W, C, S)
    nR = H // TH
    S2 = S * S
    K2S2 = 9 * S2
    x_cur, x_prev, x_next = _tiled_specs(TH, W, C, nR)
    enc_cur, _, _ = _tiled_specs(TH, W, K2S2, nR)
    acc_cur, _, _ = _tiled_specs(TH, W, S2 * C, nR)
    bias_spec = pl.BlockSpec((S2 * C,), lambda b, i: (0,),
                             memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 1, 8, S2 * C), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(_fwd_moments_kernel, S=S, TH=TH, W=W, C=C,
                               gate=gate)
    fb, s1_p, s2_p = pl.pallas_call(
        kernel,
        grid=(B, nR),
        in_specs=[x_prev, x_cur, x_next, enc_cur, bias_spec],
        out_specs=[acc_cur, part_spec, part_spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, S2 * C), x.dtype),
                   jax.ShapeDtypeStruct((B, nR, 8, S2 * C), jnp.float32),
                   jax.ShapeDtypeStruct((B, nR, 8, S2 * C), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * B * H * W * S2 * C + 3 * B * H * W * S2 * C,
            transcendentals=B * H * W * 9 * S2,
            bytes_accessed=(x.size + enc.size + B * H * W * S2 * C) * 2),
        interpret=interpret,
    )(x, x, x, enc, bias_t)
    if not gate:
        zero = jnp.zeros((B, S2 * C), jnp.float32)
        return fb, zero, zero
    # pooled per real channel over (H, W, G), re-tiled — exactly
    # ops.simam._flat_stats on the biased map
    G = S2
    N = H * W * G
    n = N - 1
    s1 = jnp.sum(s1_p, axis=(1, 2))                   # (B, G*C)
    s2 = jnp.sum(s2_p, axis=(1, 2))
    s1_c = jnp.sum(s1.reshape(B, G, C), axis=1)       # (B, C)
    s2_c = jnp.sum(s2.reshape(B, G, C), axis=1)
    mu_c = s1_c / N
    v_c = (s2_c - N * jnp.square(mu_c)) / n
    mu = jnp.tile(mu_c, (1, G))
    v = jnp.tile(v_c, (1, G))
    return fb, mu, v


# ---------------------------------------------------------------------------
# backward: head elementwise VJP + CARAFE backward in one kernel (K4)
# ---------------------------------------------------------------------------

def _fused_bwd_kernel(xp_ref, xc_ref, xn_ref, enc_ref, encp_ref, encn_ref,
                      fb_ref, fbp_ref, fbn_ref, dy_ref, dyp_ref, dyn_ref,
                      mu_ref, v_ref, A_ref, B_ref, kwt_ref,
                      dx_ref, denc_ref, db_ref, *,
                      S: int, TH: int, W: int, C: int, lam: float,
                      G: int, F: int, Npool: int, npool: int, gate: bool):
    """Recompute the head's elementwise VJP (``dacc``) for the row tile AND
    its one-row halo from the stored biased map, then run the CARAFE
    backward (softmax VJP + tap gather) on it entirely in VMEM."""
    K2, S2 = 9, S * S
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    work = xc_ref.dtype
    R = TH + 2

    # ---- dacc for rows [tile-1, tile+TH]: the head VJP of
    # ops.pallas_simam_head._bwd2_kernel, on extended rows ----
    fb_ext = _row_ext(fbp_ref, fb_ref, fbn_ref, i, ni)    # (R, W, G*C)
    dy_ext = _row_ext(dyp_ref, dy_ref, dyn_ref, i, ni)    # (R, W, G*F)
    GC = fb_ext.shape[-1]
    dg = _mm(dy_ext.reshape(R * W, G * F), kwt_ref[...]).reshape(R, W, GC)
    if gate:
        xf = fb_ext.astype(jnp.float32)
        mu = mu_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        w4 = 1.0 / (4.0 * (v + lam))
        xcen = xf - mu
        e = jnp.square(xcen) * w4 + 0.5
        g = jax.nn.sigmoid(e)
        gp = g * (1.0 - g)
        t = dg * xf * gp
        A_ = A_ref[0, 0].astype(jnp.float32)
        B_ = B_ref[0, 0].astype(jnp.float32)
        dacc_f = (dg * g + 2.0 * w4 * t * xcen
                  - (2.0 * w4 / Npool) * A_
                  - (8.0 * jnp.square(w4) / npool) * B_ * xcen)
    else:
        dacc_f = dg
    # rows outside the image contribute nothing (the old path zeroed the
    # stored dacc's halo rows at the image edges in _row_ext)
    row = lax.broadcasted_iota(jnp.int32, dacc_f.shape, 0)
    dacc_f = jnp.where(jnp.logical_and(row == 0, i == 0), 0.0, dacc_f)
    dacc_f = jnp.where(jnp.logical_and(row == R - 1, i == ni - 1), 0.0,
                       dacc_f)
    # out-conv bias gradient: sum of the LOCAL rows' dacc (f32, pre-cast —
    # same reduction the old elementwise pass emitted)
    db_ref[0, 0] = _row8(jnp.sum(dacc_f[1:TH + 1], axis=(0, 1)), GC)
    # cast through the compute dtype exactly where the old chain stored
    # dacc to HBM
    dacc_ext = dacc_f.astype(work)
    da = dacc_ext[1:TH + 1]

    # ---- CARAFE backward (ops.pallas_carafe._bwd_kernel body) ----
    # one softmax over the extended rows serves BOTH the local-row dp/denc
    # math (rows 1..TH+1) and the dx gather below — the separate local
    # softmax recompute was pure waste (round-4 K4 trim)
    p_ext = _row_ext(encp_ref, enc_ref, encn_ref, i, ni, jnp.float32)
    p_ext = _softmax_taps(p_ext, K2, S2, work)        # (TH+2, W, 9*S2)
    p = p_ext[1:TH + 1]                               # (TH, W, 9*S2)
    x_ext = _row_ext(xp_ref, xc_ref, xn_ref, i, ni)   # (TH+2, W, C)
    xk = _taps(x_ext, TH)                             # 9 x (TH, W, C)

    ind = (lax.broadcasted_iota(jnp.int32, (S2 * C, S2), 0) // C
           == lax.broadcasted_iota(jnp.int32, (S2 * C, S2), 1)
           ).astype(work)
    da2 = da.reshape(TH * W, S2 * C)
    mm_prec = (lax.Precision.HIGHEST if da2.dtype == jnp.float32
               else lax.Precision.DEFAULT)
    dp = []  # K2 entries of (TH, W, S2)
    for k in range(K2):
        tk = da2 * _tile_c(xk[k], S2).reshape(TH * W, S2 * C)
        dpk = lax.dot_general(tk, ind, (((1,), (0,)), ((), ())),
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

    dx = None
    k = 0
    for dy_ in (-1, 0, 1):
        p_rows = p_ext[1 - dy_:1 - dy_ + TH]
        dacc_rows = dacc_ext[1 - dy_:1 - dy_ + TH]
        for dx_ in (-1, 0, 1):
            base = k * S2
            m = _expand_s(p_rows[:, :, base:base + S2], C) * dacc_rows
            q = _fold_sum_s(m, S2, C)
            contrib = _shift_cols(q, -dx_)
            dx = contrib if dx is None else dx + contrib
            k += 1
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _fused_bwd_call(x, enc, fb, dy, mu, v, A, Bq, kwt, S, lam, G, F, gate,
                    interpret):
    B, H, W, C = x.shape
    TH = _row_tile(H, W, C, S)
    nR = H // TH
    S2 = S * S
    K2S2 = 9 * S2
    GC = S2 * C
    x_cur, x_prev, x_next = _tiled_specs(TH, W, C, nR)
    enc_cur, enc_prev, enc_next = _tiled_specs(TH, W, K2S2, nR)
    fb_cur, fb_prev, fb_next = _tiled_specs(TH, W, GC, nR)
    dy_cur, dy_prev, dy_next = _tiled_specs(TH, W, G * F, nR)
    row_spec = pl.BlockSpec((1, 1, GC), lambda b, i: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((G * F, GC), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 1, 8, GC), lambda b, i: (b, i, 0, 0),
                             memory_space=pltpu.VMEM)
    Npool = H * W * G
    kernel = functools.partial(
        _fused_bwd_kernel, S=S, TH=TH, W=W, C=C, lam=lam, G=G, F=F,
        Npool=Npool, npool=Npool - 1, gate=gate)
    dx, denc, db_p = pl.pallas_call(
        kernel,
        grid=(B, nR),
        in_specs=[x_prev, x_cur, x_next, enc_cur, enc_prev, enc_next,
                  fb_cur, fb_prev, fb_next, dy_cur, dy_prev, dy_next,
                  row_spec, row_spec, row_spec, row_spec, mat_spec],
        out_specs=[x_cur, enc_cur, part_spec],
        out_shape=[jax.ShapeDtypeStruct(x.shape, x.dtype),
                   jax.ShapeDtypeStruct(enc.shape, enc.dtype),
                   jax.ShapeDtypeStruct((B, nR, 8, GC), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=6 * 9 * B * H * W * S2 * C + 16 * B * H * W * GC,
            transcendentals=3 * B * H * W * 9 * S2 + B * H * W * GC,
            bytes_accessed=(x.size + 2 * enc.size + 2 * B * H * W * GC) * 2),
        interpret=interpret,
    )(x, x, x, enc, enc, enc, fb, fb, fb, dy, dy, dy,
      mu[:, None, :], v[:, None, :], A[:, None, :], Bq[:, None, :], kwt)
    # pool the bias gradient per real channel (sum over slots), like the
    # unfused head's db
    db = jnp.sum(db_p, axis=(0, 1, 2))               # (GC,)
    db = jnp.sum(db.reshape(G, C), axis=0)
    return dx, denc, db


# ---------------------------------------------------------------------------
# the public op
# ---------------------------------------------------------------------------

def _reference(x, enc, bias, w, up_factor, ksize, lam, gate):
    """Pure-XLA oracle: reassemble -> pre-shuffle layout -> bias -> SimAM ->
    grouped head dot (identical math to the pre-fusion composition)."""
    from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble
    from cswin_simam_unet_tpu.ops.pallas_carafe import _pixel_unshuffle
    from cswin_simam_unet_tpu.ops.pallas_simam_head import (
        _reference as head_reference,
    )
    up = _pixel_unshuffle(carafe_reassemble(x, enc, up_factor, ksize),
                          up_factor)
    return head_reference(up, bias, w, up_factor * up_factor, lam, gate)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def carafe_simam_head(x, enc, bias, w, up_factor: int, ksize: int = 3,
                      lam: float = 1e-4, gate: bool = True):
    """Fused CARAFE-upsample + bias + SimAM + 1x1 head, flat layout.

    x (B, H, W, C): low-res features AFTER the out-conv's linear part;
    enc (B, H, W, 9*S^2): kernel-prediction logits;
    bias (C,): the out-conv bias, in the compute dtype;
    w (C, F) f32: the head's 1x1 kernel, F <= 8.

    Returns logits (B, H, W, S^2*F) in x.dtype, lane slot ``s*F + f``
    (pre-pixel-shuffle layout — the (B, S*H, S*W, F) image is one tiny
    unshuffle away).
    """
    if w.shape[-1] > 8:
        raise ValueError(f"carafe_simam_head supports at most 8 classes, "
                         f"got {w.shape[-1]}; use the unfused chain")
    return _fwd(x, enc, bias, w, up_factor, ksize, lam, gate)[0]


def _fwd(x, enc, bias, w, up_factor, ksize, lam, gate):
    assert ksize == 3, "carafe_simam_head supports ksize=3"
    S = up_factor
    G = S * S
    F = w.shape[-1]
    bias_t = jnp.tile(bias, G)
    fb, mu, v = _carafe_biased_moments(x, enc, bias_t, S, gate, _INTERPRET)
    kw = _kron_eye(w, G, fb.dtype)
    zeros_b = jnp.zeros_like(bias_t)  # bias already folded into fb
    out = head_fwd_pallas(fb, mu, v, zeros_b, kw, G, F, lam, gate,
                          interpret=_INTERPRET)
    return out, (x, enc, bias, w, fb, mu, v)


def _bwd(up_factor, ksize, lam, gate, residuals, dy):
    x, enc, bias, w, fb, mu, v = residuals
    S = up_factor
    G = S * S
    B, H, W, C = x.shape
    F = w.shape[-1]
    kwt = _kron_eye(w.T, G, dy.dtype)                # (G*F, G*C)
    if gate:
        zeros_b = jnp.zeros((G * C,), fb.dtype)
        A, Bq, dW = head_bwd1_pallas(fb, dy, mu, v, zeros_b, kwt, G, C, F,
                                     lam, interpret=_INTERPRET)
    else:
        from cswin_simam_unet_tpu.ops.pallas_simam_head import (
            _bwd1_nogate_kernel,
            _specs,
            _tile_h,
        )
        TH = _tile_h(H)
        nR, x_spec, row_spec, vec, mat, part = _specs(B, H, W, G * C, TH)
        dy_spec = pl.BlockSpec((1, TH, W, G * F), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)
        k1 = functools.partial(_bwd1_nogate_kernel, G=G, C=C, F=F)
        dW_p = pl.pallas_call(
            k1,
            grid=(B, nR),
            in_specs=[x_spec, dy_spec, vec(G * C)],
            out_specs=part(C),
            out_shape=jax.ShapeDtypeStruct((B, nR, 8, C), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=_INTERPRET,
        )(fb, dy, jnp.zeros((G * C,), fb.dtype))
        dW = jnp.sum(dW_p, axis=(0, 1))[:F, :].T
        A = Bq = jnp.zeros((B, G * C), jnp.float32)
    dx, denc, db = _fused_bwd_call(x, enc, fb, dy, mu, v, A, Bq, kwt,
                                   S, lam, G, F, gate, _INTERPRET)
    return dx, denc, db.astype(bias.dtype), dW.astype(w.dtype)


carafe_simam_head.defvjp(_fwd, _bwd)
