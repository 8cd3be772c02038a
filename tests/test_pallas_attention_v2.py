"""v2 fused stripe-attention (image-layout carving + in-kernel LePE) vs the
XLA oracle: forward across geometries/heads, gradients, interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cswin_simam_unet_tpu.ops.pallas_attention_v2 as pa2
from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.windows import stripe_geometry


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pa2._INTERPRET
    pa2._INTERPRET = True
    yield
    pa2._INTERPRET = old


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale)


@pytest.mark.parametrize("H,split,idx,heads", [
    (8, 1, 0, 1),    # width-1 vertical stripes
    (8, 2, 0, 2),    # vertical
    (8, 2, 1, 2),    # horizontal
    (8, 8, -1, 4),   # global window
    (16, 4, 0, 2),   # multiple window tiles
    (16, 4, 1, 4),
])
def test_v2_matches_xla_forward(H, split, idx, heads):
    W = H
    C = 32
    hsp, wsp = stripe_geometry(H, split, idx)
    q, k, v = (_rand((2, H * W, C), s) for s in (1, 2, 3))
    kernel = _rand((3, 3, 1, C), 4, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)
    want = np.asarray(stripe_attention(q, k, v, kernel, **kw))
    got = np.asarray(pa2.stripe_attention_pallas_v2(q, k, v, kernel, **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,split,idx,heads", [
    (8, 1, 0, 1),    # width-1 vertical stripes
    (8, 2, 0, 2),    # vertical
    (8, 2, 1, 2),    # horizontal
    (8, 8, -1, 4),   # global window
    (16, 4, 0, 2),   # multiple window tiles
])
def test_v2_gradients_match_xla(H, split, idx, heads):
    W = H
    C = 16
    hsp, wsp = stripe_geometry(H, split, idx)
    q, k, v = (_rand((1, H * W, C), s) for s in (5, 6, 7))
    kernel = _rand((3, 3, 1, C), 8, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)

    def loss(fn):
        def f(q, k, v, kern):
            o = fn(q, k, v, kern, **kw)
            return jnp.sum(o * jnp.cos(o))
        return f

    g_want = jax.grad(loss(stripe_attention), argnums=(0, 1, 2, 3))(
        q, k, v, kernel)
    g_got = jax.grad(loss(pa2.stripe_attention_pallas_v2),
                     argnums=(0, 1, 2, 3))(q, k, v, kernel)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_v2_dropout_falls_back():
    H = W = 8
    C = 16
    q, k, v = (_rand((1, H * W, C), s) for s in (0, 1, 2))
    kernel = _rand((3, 3, 1, C), 3, 0.2)
    out = pa2.stripe_attention_pallas_v2(
        q, k, v, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=2,
        attn_drop=0.3, deterministic=False,
        dropout_rng=jax.random.PRNGKey(0))
    assert out.shape == (1, H * W, C)
