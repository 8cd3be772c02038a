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
    np.testing.assert_allclose(pattern[kept], expected, rtol=1e-4)


def test_dropout_gradient_finite_difference():
    """The fused backward regenerates the mask; with a fixed key the whole
    function is deterministic, so its custom VJP must match central
    finite differences."""
    H = W = 8
    C = 16
    rng = jax.random.PRNGKey(7)
    q, k, v = (_rand((1, H * W, C), s) for s in (5, 6, 7))
    kernel = _rand((3, 3, 1, C), 8, 0.2)

    def f(v_):
        o = pa2.stripe_attention_pallas_v2(
            q, k, v_, kernel, H=H, W=W, hsp=H, wsp=2, num_heads=2,
            attn_drop=0.3, deterministic=False, dropout_rng=rng)
        return jnp.sum(o * jnp.cos(o))

    g = np.asarray(jax.grad(f)(v))
    eps = 1e-3
    rsel = np.random.RandomState(0)
    for _ in range(8):
        i = (0, rsel.randint(H * W), rsel.randint(C))
        dv = np.zeros(v.shape, np.float32)
        dv[i] = eps
        num = (float(f(v + dv)) - float(f(v - dv))) / (2 * eps)
        np.testing.assert_allclose(g[i], num, rtol=5e-2, atol=5e-3)


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
