"""Stripe attention (XLA path) vs a naive per-window numpy oracle.

Covers both stripe orientations, the global window, multiple heads, the
LePE depthwise conv (zero-padded per window), and gradient flow.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.windows import stripe_geometry


def naive_depthwise3x3(img, kernel):
    """img (hsp, wsp, C); kernel (3, 3, 1, C) -> zero-padded depthwise conv."""
    H, W, C = img.shape
    padded = np.zeros((H + 2, W + 2, C), img.dtype)
    padded[1:-1, 1:-1] = img
    out = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            out += padded[dy:dy + H, dx:dx + W] * kernel[dy, dx, 0]
    return out


def naive_stripe_attention(q, k, v, kernel, H, W, hsp, wsp, num_heads):
    B, L, C = q.shape
    d = C // num_heads
    scale = d ** -0.5
    out = np.zeros_like(q)
    nh, nw = H // hsp, W // wsp
    qi = q.reshape(B, H, W, C)
    ki = k.reshape(B, H, W, C)
    vi = v.reshape(B, H, W, C)
    oi = out.reshape(B, H, W, C)
    for b in range(B):
        for wy in range(nh):
            for wx in range(nw):
                sl = (slice(wy * hsp, (wy + 1) * hsp),
                      slice(wx * wsp, (wx + 1) * wsp))
                qw = qi[b][sl].reshape(-1, C)
                kw = ki[b][sl].reshape(-1, C)
                vw = vi[b][sl].reshape(-1, C)
                lepe = naive_depthwise3x3(vi[b][sl], kernel).reshape(-1, C)
                ow = np.zeros_like(qw)
                for h in range(num_heads):
                    cs = slice(h * d, (h + 1) * d)
                    a = (qw[:, cs] * scale) @ kw[:, cs].T
                    a = np.exp(a - a.max(-1, keepdims=True))
                    a /= a.sum(-1, keepdims=True)
                    ow[:, cs] = a @ vw[:, cs] + lepe[:, cs]
                oi[b][sl] = ow.reshape(hsp, wsp, C)
    return out


@pytest.mark.parametrize("idx,num_heads", [(0, 1), (1, 1), (0, 2), (1, 2), (-1, 4)])
def test_stripe_attention_vs_naive(idx, num_heads):
    H = W = 8
    split = 2
    C = 8
    hsp, wsp = stripe_geometry(H, split, idx)
    rs = np.random.RandomState(idx + 10 + num_heads)
    q = rs.randn(2, H * W, C).astype(np.float32)
    k = rs.randn(2, H * W, C).astype(np.float32)
    v = rs.randn(2, H * W, C).astype(np.float32)
    kernel = rs.randn(3, 3, 1, C).astype(np.float32) * 0.1
    got = np.asarray(stripe_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kernel),
        H=H, W=W, hsp=hsp, wsp=wsp, num_heads=num_heads))
    want = naive_stripe_attention(q, k, v, kernel, H, W, hsp, wsp, num_heads)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_lepe_is_per_window_padded():
    # LePE must zero-pad at *window* boundaries, not image boundaries
    # (reference applies get_v after the window reshape,
    # train_cswinunet_segmentation.py:256-269).
    H = W = 4
    C = 1
    hsp, wsp = 4, 2  # two vertical stripes
    kernel = np.zeros((3, 3, 1, C), np.float32)
    kernel[1, 2, 0, 0] = 1.0  # pick up the right neighbour
    v = np.arange(H * W, dtype=np.float32).reshape(1, H * W, C)
    q = np.zeros_like(v)
    k = np.zeros_like(v)
    out = np.asarray(stripe_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(kernel),
        H=H, W=W, hsp=hsp, wsp=wsp, num_heads=1))
    img = out.reshape(H, W)
    vimg = v.reshape(H, W)
    # attention part: uniform (q=0) average over each stripe
    stripe_means = vimg.reshape(H, 2, 2).mean(axis=(0, 2))
    # column 1 is the right edge of stripe 0: its right neighbour is OUTSIDE
    # the window -> lepe contribution 0 there.
    np.testing.assert_allclose(img[:, 1], stripe_means[0], rtol=1e-5)
    # column 0 sees column 1 as its right neighbour
    np.testing.assert_allclose(img[:, 0], stripe_means[0] + vimg[:, 1], rtol=1e-5)


def test_attention_gradients_finite():
    H = W = 4
    C = 4
    rs = np.random.RandomState(0)
    arrs = [jnp.asarray(rs.randn(1, H * W, C).astype(np.float32)) for _ in range(3)]
    kernel = jnp.asarray(rs.randn(3, 3, 1, C).astype(np.float32))

    def f(q, k, v):
        return jnp.sum(stripe_attention(q, k, v, kernel, H=H, W=W, hsp=H,
                                        wsp=2, num_heads=2) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2))(*arrs)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
