"""Fused CSWin stripe-attention kernel v2 — windows carved from image layout.

The v1 kernel (:mod:`cswin_simam_unet_tpu.ops.pallas_attention`) fuses the
attention math but still consumes window-partitioned (G, N, D) tensors built
in XLA — and with d_head 32 those are 4x lane-padded in HBM, so the layout
shuffles dominate (a stage-1 block spends ~13 ms of 16.8 ms outside the MLP
at 512^2 batch 16).  v2 eliminates the window materialisation entirely: the
Pallas grid tiles the (B, H, W, C) *image* directly (BlockSpec index maps do
the stripe carving), and each grid step computes, fully in VMEM:

    window tokens -> per-head scaled qk^T -> softmax -> pv
    + LePE (window-local zero-padded depthwise 3x3 on v, 9 shifted FMAs)

and writes the output back in image layout.  No (G, N, D) arrays, no
padded HBM buffers, no separate LePE convolution.

Backward currently reuses the XLA stripe-attention VJP (identical math);
a fused backward kernel is the planned next step.  Training with
attention-dropout active routes to the XLA path entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cswin_simam_unet_tpu.ops.attention import stripe_attention

_INTERPRET = False


def _lepe_window(v_img, kernel, wh: int, ww: int):
    """Depthwise 3x3 conv of one (wh, ww, Cb) window with zero padding at the
    window edges (the reference applies get_v per window —
    train_cswinunet_segmentation.py:256-269).  kernel: (3, 3, Cb) f32."""
    out = None
    for dy in (-1, 0, 1):
        if wh == 1 and dy != 0:
            continue  # 1-row window: vertical taps fall outside (zero pad)
        # tap dy reads v(y + dy): shift rows so rows(y) = v(y + dy)
        if dy == 1:
            rows = jnp.concatenate(
                [v_img[1:], jnp.zeros_like(v_img[:1])], axis=0)
        elif dy == -1:
            rows = jnp.concatenate(
                [jnp.zeros_like(v_img[:1]), v_img[:-1]], axis=0)
        else:
            rows = v_img
        for dx in (-1, 0, 1):
            if ww == 1 and dx != 0:
                continue  # 1-column window: horizontal taps are zero
            if dx == 1:
                tap = jnp.concatenate(
                    [rows[:, 1:], jnp.zeros_like(rows[:, :1])], axis=1)
            elif dx == -1:
                tap = jnp.concatenate(
                    [jnp.zeros_like(rows[:, :1]), rows[:, :-1]], axis=1)
            else:
                tap = rows
            # kernel tap index: conv weight w[dy+1, dx+1] multiplies the
            # input at (y + dy, x + dx) — matching HWIO conv semantics
            w = kernel[dy + 1, dx + 1]  # (Cb,)
            term = tap * w[None, None, :]
            out = term if out is None else out + term
    return out


def _attn_kernel(q_ref, k_ref, v_ref, w_ref, o_ref, *, vertical: bool,
                 TW: int, wh: int, ww: int, heads: int, scale: float):
    """One image tile holding TW windows of shape (wh, ww)."""
    Cb = q_ref.shape[-1]
    dh = Cb // heads
    N = wh * ww
    kern = w_ref[:, :, 0, :].astype(jnp.float32)  # (3, 3, Cb)

    for t in range(TW):
        if vertical:
            sl = (0, slice(None), slice(t * ww, (t + 1) * ww), slice(None))
        else:
            sl = (0, slice(t * wh, (t + 1) * wh), slice(None), slice(None))
        qw = q_ref[sl].astype(jnp.float32)  # (wh, ww, Cb)
        kw = k_ref[sl].astype(jnp.float32)
        vw = v_ref[sl].astype(jnp.float32)
        lepe = _lepe_window(vw, kern, wh, ww)

        q2 = qw.reshape(N, Cb)
        k2 = kw.reshape(N, Cb)
        v2 = vw.reshape(N, Cb)
        le2 = lepe.reshape(N, Cb)

        outs = []
        for h in range(heads):
            cs = slice(h * dh, (h + 1) * dh)
            s = lax.dot_general(q2[:, cs] * scale, k2[:, cs],
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            s = s - jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o_h = jnp.dot(p, v2[:, cs],
                          preferred_element_type=jnp.float32)
            outs.append(o_h + le2[:, cs])
        o2 = outs[0] if heads == 1 else jnp.concatenate(outs, axis=-1)
        o_ref[sl] = o2.reshape(wh, ww, Cb).astype(o_ref.dtype)


def _pick_tw(n_windows: int, N: int, ww: int, W: int,
             vertical: bool) -> int:
    """Windows per grid tile.  For vertical stripes the block's
    second-to-last dim is TW*ww, which Mosaic requires to be divisible by 8
    or equal to the full W — prefer the largest conforming divisor of
    n_windows near the ~2048-token target, falling back to one full-width
    tile."""
    target = max(1, 2048 // N)
    best = None
    for tw in range(min(target, n_windows), 0, -1):
        if n_windows % tw:
            continue
        if not vertical or (tw * ww) % 8 == 0 or tw * ww == W:
            return tw
        if best is None:
            best = tw
    if vertical:
        return n_windows  # full-width tile (block dim == array dim)
    return best or 1


def _branch_fwd_impl(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads, scale):
    B, L, Cb = q.shape
    vertical = hsp == H  # full-height vertical stripes (or global window)
    wh, ww = hsp, wsp
    N = wh * ww
    n_windows = (H // hsp) * (W // wsp)
    TW = _pick_tw(n_windows, N, wsp, W, vertical)

    def img(x):
        return x.reshape(B, H, W, Cb)

    if vertical:
        block = (1, H, TW * ww, Cb)
        grid = (B, n_windows // TW)
        imap = lambda b, i: (b, 0, i, 0)
    else:
        block = (1, TW * wh, W, Cb)
        grid = (B, n_windows // TW)
        imap = lambda b, i: (b, i, 0, 0)

    spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 3, 1, Cb), lambda b, i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _attn_kernel, vertical=vertical, TW=TW, wh=wh, ww=ww,
        heads=num_heads, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, spec, spec, w_spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cb), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * L * N * Cb + 18 * B * L * Cb,
            transcendentals=B * L * N,
            bytes_accessed=8 * B * L * Cb),
        interpret=_INTERPRET,
    )(img(q), img(k), img(v), lepe_kernel)
    return out.reshape(B, L, Cb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _branch_attention(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads, scale):
    return _branch_fwd_impl(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads,
                            scale)


def _branch_fwd(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads, scale):
    out = _branch_fwd_impl(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads,
                           scale)
    return out, (q, k, v, lepe_kernel)


def _branch_bwd(H, W, hsp, wsp, num_heads, scale, residuals, dout):
    # exact gradients via the XLA oracle's VJP (identical math); a fused
    # backward kernel is future work
    q, k, v, lepe_kernel = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, w_: stripe_attention(
            q_, k_, v_, w_, H=H, W=W, hsp=hsp, wsp=wsp, num_heads=num_heads,
            scale=scale),
        q, k, v, lepe_kernel)
    return vjp(dout)


_branch_attention.defvjp(_branch_fwd, _branch_bwd)


def stripe_attention_pallas_v2(
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
    """Drop-in stripe-attention with v2 fused kernel (image-layout carving
    + in-kernel LePE).  Falls back to XLA when attention dropout is active."""
    if attn_drop > 0.0 and not deterministic:
        return stripe_attention(
            q, k, v, lepe_kernel, H=H, W=W, hsp=hsp, wsp=wsp,
            num_heads=num_heads, scale=scale, attn_drop=attn_drop,
            deterministic=deterministic, dropout_rng=dropout_rng)
    Cb = q.shape[-1]
    if scale is None:
        scale = (Cb // num_heads) ** -0.5
    return _branch_attention(q, k, v, lepe_kernel, H, W, hsp, wsp, num_heads,
                             float(scale))
