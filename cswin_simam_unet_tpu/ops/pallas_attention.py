"""Fused Pallas TPU kernel for cross-shaped-window (stripe) attention.

The reference computes stripe attention as separate torch ops — qk matmul,
softmax, dropout, pv matmul (train_cswinunet_segmentation.py:287-292) —
which on TPU would materialise the (N, N) attention matrix in HBM for every
window of every block.  This kernel fuses scale -> qk^T -> mask -> softmax
-> pv into one VMEM-resident pass per window group (forward), and the full
attention backward (softmax VJP + three matmuls) into a second kernel, via
``jax.custom_vjp``.  CSWin windows are tiny (N = stripe tokens, 64..256;
d_head 16..64), so a whole window's score matrix fits comfortably in VMEM —
no online softmax needed; the win is fusion and the removal of HBM round
trips, with windows batched over the Pallas grid.

Layout contract: (G, N, D) where G = batch * num_windows * heads.  The
window partition/merge shuffles and the LePE depthwise conv stay in XLA
(they fuse into neighbouring ops); see
:func:`cswin_simam_unet_tpu.ops.attention.stripe_attention` for the
always-available XLA oracle this kernel is validated against.

Attention dropout (train-time attn_drop > 0) currently routes to the XLA
path — in-kernel PRNG dropout is a planned extension.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_simam_unet_tpu.ops.attention import lepe_depthwise, stripe_attention
from cswin_simam_unet_tpu.ops.windows import (
    img2windows,
    tokens_to_nhwc,
    windows2img,
)

_INTERPRET = False  # flipped by tests on CPU


def _pick_group(G: int, cap: int = 8) -> int:
    for gb in range(min(cap, G), 0, -1):
        if G % gb == 0:
            return gb
    return 1


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    GB, Np, D = q_ref.shape

    def body(g, _):
        q = q_ref[g].astype(jnp.float32) * scale
        k = k_ref[g].astype(jnp.float32)
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if n_valid < Np:
            col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p, v_ref[g].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(o_ref.dtype)
        return 0

    lax.fori_loop(0, GB, body, 0)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale: float, n_valid: int):
    GB, Np, D = q_ref.shape

    def body(g, _):
        q = q_ref[g].astype(jnp.float32) * scale
        k = k_ref[g].astype(jnp.float32)
        v = v_ref[g].astype(jnp.float32)
        do = do_ref[g].astype(jnp.float32)
        s = lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if n_valid < Np:
            col = lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < n_valid, s, -1e30)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        # dV = P^T dO
        dv = lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
        dp = lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        # dQ = dS K * scale ; dK = dS^T (Q*scale)... note q already scaled
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32) * scale
        dk = lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        dq_ref[g] = dq.astype(dq_ref.dtype)
        dk_ref[g] = dk.astype(dk_ref.dtype)
        dv_ref[g] = dv.astype(dv_ref.dtype)
        return 0

    lax.fori_loop(0, GB, body, 0)


def _pad_tokens(x: jnp.ndarray, np_: int) -> jnp.ndarray:
    G, N, D = x.shape
    if N == np_:
        return x
    return jnp.pad(x, ((0, 0), (0, np_ - N), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_attention(q, k, v, scale: float, n_valid: int):
    """Fused softmax attention over (G, Np, D) window groups; columns
    >= n_valid are masked out (token padding)."""
    return _window_attention_fwd_impl(q, k, v, scale, n_valid)


def _pallas_call(kernel, shapes, grid, block_shape, n_out):
    specs = [pl.BlockSpec(block_shape, lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM) for _ in range(len(shapes))]
    out_specs = [pl.BlockSpec(block_shape, lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM) for _ in range(n_out)]
    return specs, out_specs


def _window_attention_fwd_impl(q, k, v, scale, n_valid):
    G, Np, D = q.shape
    GB = _pick_group(G)
    kernel = functools.partial(_fwd_kernel, scale=scale, n_valid=n_valid)
    in_specs, out_specs = _pallas_call(kernel, (q, k, v), G // GB,
                                       (GB, Np, D), 1)
    flops = 2 * 2 * G * Np * Np * D
    return pl.pallas_call(
        kernel,
        grid=(G // GB,),
        in_specs=in_specs,
        out_specs=out_specs[0],
        out_shape=jax.ShapeDtypeStruct((G, Np, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=G * Np * Np,
            bytes_accessed=4 * G * Np * D * 4),
        interpret=_INTERPRET,
    )(q, k, v)


def _window_attention_fwd(q, k, v, scale, n_valid):
    o = _window_attention_fwd_impl(q, k, v, scale, n_valid)
    return o, (q, k, v)


def _window_attention_bwd(scale, n_valid, residuals, do):
    q, k, v = residuals
    G, Np, D = q.shape
    GB = _pick_group(G)
    kernel = functools.partial(_bwd_kernel, scale=scale, n_valid=n_valid)
    in_specs, out_specs = _pallas_call(kernel, (q, k, v, do), G // GB,
                                       (GB, Np, D), 3)
    flops = 5 * 2 * G * Np * Np * D
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(G // GB,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[jax.ShapeDtypeStruct((G, Np, D), q.dtype)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=G * Np * Np,
            bytes_accessed=7 * G * Np * D * 4),
        interpret=_INTERPRET,
    )(q, k, v, do)
    return dq, dk, dv


window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


def stripe_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    lepe_kernel: jnp.ndarray,
    *,
    H: int,
    W: int,
    hsp: int,
    wsp: int,
    num_heads: int,
    scale: float | None = None,
    attn_drop: float = 0.0,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
) -> jnp.ndarray:
    """Drop-in replacement for
    :func:`cswin_simam_unet_tpu.ops.attention.stripe_attention` backed by the
    fused kernel.  Falls back to the XLA path when attention dropout is
    active (in-kernel dropout not yet implemented)."""
    if attn_drop > 0.0 and not deterministic:
        return stripe_attention(
            q, k, v, lepe_kernel, H=H, W=W, hsp=hsp, wsp=wsp,
            num_heads=num_heads, scale=scale, attn_drop=attn_drop,
            deterministic=deterministic, dropout_rng=dropout_rng)

    B, L, C = q.shape
    d_head = C // num_heads
    if scale is None:
        scale = d_head ** -0.5
    N = hsp * wsp
    Np = -(-N // 16) * 16  # pad tokens to the bf16 sublane tile

    def to_gnd(x):
        wins = img2windows(tokens_to_nhwc(x, H, W), hsp, wsp)  # (B', N, C)
        Bw = wins.shape[0]
        wh = wins.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)
        return wh.reshape(Bw * num_heads, N, d_head), Bw

    qg, Bw = to_gnd(q)
    kg, _ = to_gnd(k)
    v_wins = img2windows(tokens_to_nhwc(v, H, W), hsp, wsp)
    lepe = lepe_depthwise(v_wins, lepe_kernel, hsp, wsp)  # (B', N, C)
    vg = v_wins.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)
    vg = vg.reshape(Bw * num_heads, N, d_head)

    o = window_attention(_pad_tokens(qg, Np), _pad_tokens(kg, Np),
                         _pad_tokens(vg, Np), float(scale), N)
    o = o[:, :N, :]
    o = o.reshape(Bw, num_heads, N, d_head).transpose(0, 2, 1, 3)
    o = o.reshape(Bw, N, C) + lepe
    img = windows2img(o, hsp, wsp, H, W)
    return img.reshape(B, L, C)
