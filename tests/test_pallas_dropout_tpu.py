"""In-kernel attention dropout tests — REAL TPU only.

The v2 kernel's dropout uses the TPU PRNG (pltpu.prng_seed/prng_random_bits),
which has no CPU/interpret lowering, so these tests skip under the CPU
conftest and run only when invoked directly against the TPU:

    cd /root/repo && JAX_PLATFORMS=axon python -m pytest \
        tests/test_pallas_dropout_tpu.py -q -p no:cacheprovider --noconftest

Covers (VERDICT round 1, item 4 done-criteria): statistical keep fraction,
determinism per key, key sensitivity, inverted-scaling mean preservation,
and gradient consistency of the fused backward with the regenerated mask
(finite differences of the seeded deterministic function).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cswin_simam_unet_tpu.ops.pallas_attention_v2 as pa2
from cswin_simam_unet_tpu.ops.attention import stripe_attention

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="in-kernel dropout needs the TPU PRNG")


def _rand(shape, seed, scale=0.5):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale)


def _run(rng, rate=0.3, H=8, seed_qkv=(1, 2, 3), heads=2):
    W = H
    C = 16
    q, k, v = (_rand((2, H * W, C), s) for s in seed_qkv)
    kernel = jnp.zeros((3, 3, 1, C), jnp.float32)  # isolate attention path
    out = pa2.stripe_attention_pallas_v2(
        q, k, v, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=heads,
        attn_drop=rate, deterministic=False, dropout_rng=rng)
    return out


def test_dropout_deterministic_per_key():
    a = np.asarray(_run(jax.random.PRNGKey(0)))
    b = np.asarray(_run(jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(a, b)


def test_dropout_key_sensitivity():
    a = np.asarray(_run(jax.random.PRNGKey(0)))
    b = np.asarray(_run(jax.random.PRNGKey(1)))
    assert not np.allclose(a, b)


def test_dropout_mean_preserved():
    """Inverted dropout: E[out] ~= dropout-free out.  With v == ones the
    attention output is exactly rowsum(p_dropped) whose expectation is 1."""
    H = W = 8
    C = 16
    rate = 0.3
    q, k = (_rand((1, H * W, C), s) for s in (1, 2))
    v = jnp.ones((1, H * W, C), jnp.float32)
    kernel = jnp.zeros((3, 3, 1, C), jnp.float32)
    outs = []
    for i in range(50):
        o = pa2.stripe_attention_pallas_v2(
            q, k, v, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=2,
            attn_drop=rate, deterministic=False,
            dropout_rng=jax.random.PRNGKey(i))
        outs.append(np.asarray(o))
    mean = np.mean(outs)  # each element's expectation is 1.0
    assert abs(mean - 1.0) < 0.02, mean
    # variance must be non-trivial (mask actually dropping ~rate of entries)
    assert np.std(np.stack(outs)) > 0.05


def test_dropout_keep_fraction():
    """With v = one-hot columns the output row i equals p_dropped[i, :] —
    read the realised keep pattern directly and check the dropped fraction."""
    H = W = 8
    N = H * W  # one global window = whole image
    C = 16
    heads = 1
    rate = 0.3
    q = jnp.zeros((1, N, C), jnp.float32)  # uniform attention: p = 1/N
    k = jnp.zeros((1, N, C), jnp.float32)
    v = jnp.eye(N, C, dtype=jnp.float32)[None]
    kernel = jnp.zeros((3, 3, 1, C), jnp.float32)
    o = np.asarray(pa2.stripe_attention_pallas_v2(
        q, k, v, kernel, H=H, W=W, hsp=H, wsp=W, num_heads=heads,
        attn_drop=rate, deterministic=False,
        dropout_rng=jax.random.PRNGKey(3)))
    # entries are either 0 (dropped) or (1/N)/(1-rate) (kept)
    pattern = o[0, :, :C]
    kept = pattern > 1e-9
    frac = kept.mean()
    assert abs(frac - (1 - rate)) < 0.08, frac
    expected = (1.0 / N) / (1 - rate)
    # rtol 2e-3: Mosaic materialises the inverted-keep scalar with bf16
    # mantissa precision (1.4296875 vs 10/7) — a fixed 0.08% scale factor,
    # irrelevant to training dynamics
    np.testing.assert_allclose(pattern[kept], expected, rtol=2e-3)


def test_dropout_gradient_v_linearity_exact():
    """For a fixed key the dropped attention matrix is a constant, so with a
    frozen cotangent G the map v -> sum(G * attention(v)) is LINEAR in v:
    L(v + u) - L(v) must equal grad(L)·u to f32 rounding.  A backward that
    regenerated a different mask than the forward fails this hard."""
    H = W = 8
    C = 16
    rng = jax.random.PRNGKey(7)
    q, k, v = (_rand((1, H * W, C), s) for s in (5, 6, 7))
    kernel = _rand((3, 3, 1, C), 8, 0.2)
    G = _rand((1, H * W, C), 9)

    def L(v_):
        o = pa2.stripe_attention_pallas_v2(
            q, k, v_, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=2,
            attn_drop=0.3, deterministic=False, dropout_rng=rng)
        return jnp.sum(o * G)

    g = np.asarray(jax.grad(L)(v)).ravel()
    u = np.random.RandomState(1).randn(*v.shape).astype(np.float32)
    lin = float(L(v + jnp.asarray(u))) - float(L(v))
    np.testing.assert_allclose(g @ u.ravel(), lin, rtol=5e-3)


def test_dropout_matches_explicit_mask_reference():
    """Decisive dropout-VJP check: the mask stream depends only on
    (key, window, head) — not on q/k/v — so it can be extracted with the
    uniform-attention identity-v trick and baked into a plain-XLA reference.
    Kernel forward AND all four gradients must match that reference."""
    from cswin_simam_unet_tpu.ops.attention import lepe_depthwise
    from cswin_simam_unet_tpu.ops.windows import (
        img2windows, tokens_to_nhwc, windows2img)

    H = W = 8
    hsp, wsp = 8, 2
    N = hsp * wsp  # 16 tokens/window, 4 windows
    C = 16         # heads=1 and C == N so the identity-v trick reads the
    rate = 0.3     # full (N, N) mask per window
    inv_keep = 1.0 / (1.0 - rate)
    rng = jax.random.PRNGKey(11)
    scale = C ** -0.5

    def kernel_call(q, k, v, kern):
        return pa2.stripe_attention_pallas_v2(
            q, k, v, kern, H=H, W=W, hsp=hsp, wsp=wsp, num_heads=1,
            attn_drop=rate, deterministic=False, dropout_rng=rng)

    # -- extract the realised keep mask (per window) --
    zeros = jnp.zeros((1, H * W, C), jnp.float32)
    eye_wins = jnp.tile(jnp.eye(N, dtype=jnp.float32)[None], (4, 1, 1))
    v_id = windows2img(eye_wins, hsp, wsp, H, W).reshape(1, H * W, C)
    o = kernel_call(zeros, zeros, v_id, jnp.zeros((3, 3, 1, C), jnp.float32))
    pd = img2windows(tokens_to_nhwc(o.reshape(1, H * W, C), H, W), hsp, wsp)
    keep = np.asarray(pd) > 1e-9  # (4, N, N)
    assert 0.6 < keep.mean() < 0.8  # sanity: ~1-rate kept

    # -- explicit-mask XLA reference --
    keep_j = jnp.asarray(keep)

    def ref_call(q, k, v, kern):
        qw = img2windows(tokens_to_nhwc(q, H, W), hsp, wsp)
        kw = img2windows(tokens_to_nhwc(k, H, W), hsp, wsp)
        vw = img2windows(tokens_to_nhwc(v, H, W), hsp, wsp)
        s = jnp.einsum("wnc,wmc->wnm", qw * scale, kw)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.where(keep_j, p * inv_keep, 0.0)
        lepe = lepe_depthwise(vw, kern, hsp, wsp)
        ow = jnp.einsum("wnm,wmc->wnc", p, vw) + lepe
        return windows2img(ow, hsp, wsp, H, W).reshape(1, H * W, C)

    q, k, v = (_rand((1, H * W, C), s) for s in (5, 6, 7))
    kern = _rand((3, 3, 1, C), 8, 0.2)

    got = np.asarray(kernel_call(q, k, v, kern))
    want = np.asarray(ref_call(q, k, v, kern))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-5)

    def loss(fn):
        def f(q_, k_, v_, kern_):
            o_ = fn(q_, k_, v_, kern_)
            return jnp.sum(o_ * jnp.cos(o_))
        return f

    g_got = jax.grad(loss(kernel_call), argnums=(0, 1, 2, 3))(q, k, v, kern)
    g_want = jax.grad(loss(ref_call), argnums=(0, 1, 2, 3))(q, k, v, kern)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_dropout_zero_rate_matches_oracle():
    H = W = 8
    C = 16
    q, k, v = (_rand((1, H * W, C), s) for s in (1, 2, 3))
    kernel = _rand((3, 3, 1, C), 4, 0.2)
    kw = dict(H=H, W=W, hsp=H, wsp=2, num_heads=2)
    want = np.asarray(stripe_attention(q, k, v, kernel, **kw))
    got = np.asarray(pa2.stripe_attention_pallas_v2(
        q, k, v, kernel, attn_drop=0.0, deterministic=False,
        dropout_rng=jax.random.PRNGKey(0), **kw))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
