"""Cross-shaped-window (stripe) attention with LePE — XLA reference path.

Semantics match the reference ``LePEAttention``
(train_cswinunet_segmentation.py:220-298): tokens are partitioned into
full-height vertical stripes, full-width horizontal stripes, or one global
window; scaled dot-product attention runs per window; a depthwise 3x3 conv
over ``v`` *in per-window layout* (zero-padded at window edges) is added to
the attention output as a locally-enhanced positional encoding (LePE).

This module is the always-available XLA einsum implementation; it serves as
the numerical oracle for the fused Pallas kernel
(:mod:`cswin_simam_unet_tpu.ops.pallas_attention`) and as the fallback on
non-TPU backends.  Layouts are NHWC / (B, L, C); matmuls are emitted as
batched ``dot_general`` so XLA tiles them onto the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cswin_simam_unet_tpu.ops.windows import img2windows, windows2img, tokens_to_nhwc


def _to_window_heads(x: jnp.ndarray, hsp: int, wsp: int, H: int, W: int,
                     num_heads: int) -> jnp.ndarray:
    """(B, L, C) tokens -> (B*nWin, heads, N, d) window-partitioned heads."""
    B, L, C = x.shape
    wins = img2windows(tokens_to_nhwc(x, H, W), hsp, wsp)  # (B', N, C)
    Bw, N, _ = wins.shape
    wins = wins.reshape(Bw, N, num_heads, C // num_heads)
    return wins.transpose(0, 2, 1, 3)


def lepe_depthwise(v_wins: jnp.ndarray, lepe_kernel: jnp.ndarray,
                   hsp: int, wsp: int) -> jnp.ndarray:
    """Depthwise 3x3 conv over v in per-window image layout.

    ``v_wins``: (B*nWin, N, C) window tokens; ``lepe_kernel``: (3, 3, 1, C)
    HWIO depthwise kernel.  The conv is applied to each window as its own
    image with zero padding at window boundaries — the reference applies
    ``get_v`` after reshaping to (B', C, H_sp, W_sp)
    (train_cswinunet_segmentation.py:256-269), so stripes do NOT see their
    neighbours.  Returns (B*nWin, N, C).
    """
    Bw, N, C = v_wins.shape
    imgs = v_wins.reshape(Bw, hsp, wsp, C)
    out = lax.conv_general_dilated(
        imgs, lepe_kernel.astype(imgs.dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )
    return out.reshape(Bw, N, C)


def stripe_attention(
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
    """One stripe/global attention branch over (B, L, C) tokens.

    Equivalent to ``LePEAttention.forward``
    (train_cswinunet_segmentation.py:271-298) for the window geometry
    (hsp, wsp) — see :func:`cswin_simam_unet_tpu.ops.windows.stripe_geometry`.
    Returns (B, L, C) tokens in image order.
    """
    B, L, C = q.shape
    if L != H * W:
        raise ValueError(f"token count {L} != {H}*{W}")
    d_head = C // num_heads
    if scale is None:
        scale = d_head ** -0.5

    qh = _to_window_heads(q, hsp, wsp, H, W, num_heads)  # (B', h, N, d)
    kh = _to_window_heads(k, hsp, wsp, H, W, num_heads)
    v_wins = img2windows(tokens_to_nhwc(v, H, W), hsp, wsp)  # (B', N, C)
    lepe = lepe_depthwise(v_wins, lepe_kernel, hsp, wsp)
    Bw, N, _ = v_wins.shape
    vh = v_wins.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)
    lepe_h = lepe.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)

    attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    if attn_drop > 0.0 and not deterministic:
        # u16 threshold bits, not bernoulli (one u32/element): halves the
        # mask generator's HBM traffic on the (B', h, N, N) score tensor —
        # same convention as ops/dropout.fast_dropout and the Pallas
        # kernel's in-kernel u32 threshold (keep-probability quantisation
        # 2^-16; rescale uses the nominal rate).
        bits = jax.random.bits(dropout_rng, attn.shape, jnp.uint16)
        thr = min(int(round(attn_drop * 65536.0)), 65535)
        inv_keep = jnp.asarray(1.0 / (1.0 - attn_drop), attn.dtype)
        attn = jnp.where(bits >= jnp.uint16(thr), attn * inv_keep,
                         jnp.zeros((), attn.dtype))

    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out + lepe_h
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
    img = windows2img(out, hsp, wsp, H, W)
    return img.reshape(B, L, C)
