"""Flash (KV-tiled online-softmax) stripe attention vs the XLA oracle.

VERDICT r03 #2: kernel-parity tests (fwd + bwd) at window sizes
{2048, 4096, 16384}.  2048/4096 compare against the full
``stripe_attention`` oracle; 16384 would need a 16384^2 score matrix in
the oracle (>1 GB), so it compares against a row-chunked numpy softmax
oracle instead (same math, O(chunk*N) memory).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cswin_simam_unet_tpu.ops.pallas_attention_flash as paf
from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.windows import stripe_geometry


@pytest.fixture(autouse=True)
def interpret_mode():
    old = paf._INTERPRET
    paf._INTERPRET = True
    yield
    paf._INTERPRET = old


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale)


# (H, split, idx, heads): window token counts 2048 (band), 2048 (vertical),
# 4096 (global), plus small windows for geometry coverage of the tiling.
GEOMS = [
    (64, 32, 1, 2),    # horizontal 32x64 bands -> N=2048, multi-tile sweep
    (64, 32, 0, 2),    # vertical stripes (flip path) -> N=2048
    (64, 64, -1, 4),   # global window -> N=4096
    (16, 8, 1, 2),     # small band, single tile
]


@pytest.mark.parametrize("H,split,idx,heads", GEOMS)
def test_flash_matches_xla_forward(H, split, idx, heads):
    W = H
    C = 16
    hsp, wsp = stripe_geometry(H, split, idx)
    q, k, v = (_rand((2, H * W, C), s) for s in (1, 2, 3))
    kernel = _rand((3, 3, 1, C), 4, 0.2)
    kw = dict(H=H, W=W, hsp=hsp, wsp=wsp, num_heads=heads)
    want = np.asarray(stripe_attention(q, k, v, kernel, **kw))
    got = np.asarray(paf.stripe_attention_pallas_flash(q, k, v, kernel,
                                                       **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,split,idx,heads", GEOMS)
def test_flash_gradients_match_xla(H, split, idx, heads):
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
    g_got = jax.grad(loss(paf.stripe_attention_pallas_flash),
                     argnums=(0, 1, 2, 3))(q, k, v, kernel)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def _chunked_softmax_attention(q, k, v, scale, chunk=512):
    """Row-chunked f64 attention oracle: O(chunk * N) memory."""
    N, d = q.shape
    out = np.empty((N, d), np.float64)
    q64, k64, v64 = (np.asarray(x, np.float64) for x in (q, k, v))
    for i in range(0, N, chunk):
        s = (q64[i:i + chunk] * scale) @ k64.T
        s -= s.max(axis=-1, keepdims=True)
        e = np.exp(s)
        p = e / e.sum(axis=-1, keepdims=True)
        out[i:i + chunk] = p @ v64
    return out


@pytest.mark.slow
def test_flash_16384_token_window_forward():
    """One 128x128 global window (N=16384) vs the chunked numpy oracle —
    the size class the guard previously routed to XLA entirely."""
    H = W = 128
    C = 8
    heads = 2
    dh = C // heads
    scale = dh ** -0.5
    q, k, v = (_rand((1, H * W, C), s, 0.3) for s in (11, 12, 13))
    kernel = jnp.zeros((3, 3, 1, C), jnp.float32)  # isolate pure attention
    got = np.asarray(paf.stripe_attention_pallas_flash(
        q, k, v, kernel, H=H, W=W, hsp=H, wsp=W, num_heads=heads))
    qn, kn, vn = (np.asarray(x[0]) for x in (q, k, v))
    for h in range(heads):
        cs = slice(h * dh, (h + 1) * dh)
        want = _chunked_softmax_attention(qn[:, cs], kn[:, cs], vn[:, cs],
                                          scale)
        np.testing.assert_allclose(got[0][:, cs], want, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_flash_16384_token_window_gradients():
    """Backward at N=16384: flash grads vs a chunked-oracle directional
    derivative (full autodiff oracle would need the N^2 matrix)."""
    H = W = 128
    C = 8
    heads = 1
    q, k, v = (_rand((1, H * W, C), s, 0.3) for s in (21, 22, 23))
    kernel = jnp.zeros((3, 3, 1, C), jnp.float32)
    kw = dict(H=H, W=W, hsp=H, wsp=W, num_heads=heads)

    def f(q, k, v):
        o = paf.stripe_attention_pallas_flash(q, k, v, kernel, **kw)
        return jnp.sum(o * o)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    # finite-difference directional check per input
    rng = np.random.RandomState(7)
    for idx, (name, x) in enumerate(zip("qkv", (q, k, v))):
        d = jnp.asarray(rng.randn(*x.shape).astype(np.float32))
        eps = 1e-3
        args = [q, k, v]
        args_p = list(args); args_p[idx] = x + eps * d
        args_m = list(args); args_m[idx] = x - eps * d
        fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
        an = float(jnp.vdot(g[idx], d))
        assert abs(fd - an) <= 2e-2 * max(1.0, abs(fd)), (name, fd, an)


def test_flash_dropout_falls_back_in_interpret():
    H = W = 8
    C = 16
    q, k, v = (_rand((1, H * W, C), s) for s in (0, 1, 2))
    kernel = _rand((3, 3, 1, C), 3, 0.2)
    out = paf.stripe_attention_pallas_flash(
        q, k, v, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=2,
        attn_drop=0.3, deterministic=False,
        dropout_rng=jax.random.PRNGKey(0))
    assert out.shape == (1, H * W, C)


def test_pick_tile():
    assert paf._pick_tile(4096) == 512
    assert paf._pick_tile(2048) == 512
    assert paf._pick_tile(196) == 196  # 448^2 global window (<=512, single)
    assert paf._pick_tile(96) == 96
    assert 3584 % paf._pick_tile(3584) == 0
