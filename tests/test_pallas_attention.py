"""Pallas fused stripe-attention vs the XLA einsum oracle (SURVEY.md §4.3):
forward + gradients, across stripe widths, padded token counts, and the
full-window mode.  Runs in interpret mode on CPU; the same kernels compile
on real TPU (exercised by bench.py and the TPU smoke script)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cswin_simam_unet_tpu.ops.pallas_attention as pa
from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.windows import stripe_geometry


@pytest.fixture(autouse=True)
def interpret_mode():
    import cswin_simam_unet_tpu.ops.pallas_attention_v2 as pa2
    import cswin_simam_unet_tpu.ops.pallas_carafe as pc
    import cswin_simam_unet_tpu.ops.pallas_carafe_head as ch
    import cswin_simam_unet_tpu.ops.pallas_simam_head as sh
    mods = (pa, pa2, pc, ch, sh)
    olds = tuple(m._INTERPRET for m in mods)
    for m in mods:
        m._INTERPRET = True
    yield
    for m, old in zip(mods, olds):
        m._INTERPRET = old


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * 0.5)


@pytest.mark.parametrize("H,split,idx,heads", [
    (8, 2, 0, 2),    # vertical stripes, N=16
    (8, 2, 1, 2),    # horizontal stripes
    (8, 8, -1, 4),   # global window, N=64
    (14, 7, 0, 2),   # N=98 -> padded to 112 (mask path)
    (16, 1, 0, 1),   # width-1 stripes, N=16
])
def test_pallas_matches_xla_forward(H, split, idx, heads):
    W = H
    C = 32
    hsp, wsp = stripe_geometry(H, split, idx)
    q, k, v = (_rand((2, H * W, C), s) for s in (1, 2, 3))
    kernel = _rand((3, 3, 1, C), 4) * 0.2
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)
    want = np.asarray(stripe_attention(q, k, v, kernel, **kw))
    got = np.asarray(pa.stripe_attention_pallas(q, k, v, kernel, **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,split,idx,heads", [
    (8, 2, 0, 2),
    (14, 7, 1, 2),   # padded N
])
def test_pallas_matches_xla_gradients(H, split, idx, heads):
    W = H
    C = 16
    hsp, wsp = stripe_geometry(H, split, idx)
    q, k, v = (_rand((1, H * W, C), s) for s in (5, 6, 7))
    kernel = _rand((3, 3, 1, C), 8) * 0.2
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)

    def loss_xla(q, k, v):
        o = stripe_attention(q, k, v, kernel, **kw)
        return jnp.sum(o * jnp.cos(o))  # non-trivial cotangent

    def loss_pallas(q, k, v):
        o = pa.stripe_attention_pallas(q, k, v, kernel, **kw)
        return jnp.sum(o * jnp.cos(o))

    g_want = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_window_attention_padding_mask():
    # padded key columns must receive zero attention weight
    G, N, Np, D = 2, 10, 16, 8
    q = _rand((G, N, D), 0)
    k = _rand((G, N, D), 1)
    v = _rand((G, N, D), 2)
    qp = pa._pad_tokens(q, Np)
    kp = pa._pad_tokens(k, Np)
    vp = pa._pad_tokens(v, Np)
    o = pa.window_attention(qp, kp, vp, 0.3, N)[:, :N, :]
    # naive reference
    s = np.einsum("gnd,gmd->gnm", np.asarray(q) * 0.3, np.asarray(k))
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("gnm,gmd->gnd", p, np.asarray(v))
    np.testing.assert_allclose(np.asarray(o), want, rtol=2e-5, atol=2e-5)


def test_model_with_pallas_matches_xla():
    from cswin_simam_unet_tpu.models import CSWinUNet
    kw = dict(img_size=64, embed_dim=16, depth=(1, 1, 1, 1),
              split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2))
    x = _rand((1, 64, 64, 3), 0)
    m_xla = CSWinUNet(**kw)
    variables = m_xla.init(jax.random.PRNGKey(0), x, train=False)
    want = np.asarray(m_xla.apply(variables, x, train=False))
    m_pl = CSWinUNet(use_pallas=True, **kw)
    got = np.asarray(m_pl.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-5)
