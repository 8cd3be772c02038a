"""fast_dropout: keep statistics, rescale, determinism, zero-rate identity."""

import jax
import jax.numpy as jnp
import numpy as np

from cswin_simam_unet_tpu.ops.dropout import fast_dropout


def test_zero_rate_identity():
    x = jnp.ones((4, 6), jnp.float32)
    out = fast_dropout(jax.random.PRNGKey(0), x, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_keep_fraction_and_scale():
    rate = 0.3
    x = jnp.ones((64, 1024), jnp.float32)
    out = np.asarray(fast_dropout(jax.random.PRNGKey(1), x, rate))
    kept = out != 0.0
    # kept values are rescaled by exactly 1/(1-rate)
    np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # realised keep probability ~= 1 - rate (u16 threshold, 2^-16 quantised)
    frac = kept.mean()
    assert abs(frac - (1.0 - rate)) < 0.01, frac
    # E[out] ~= E[x] (inverted dropout preserves expectation)
    assert abs(out.mean() - 1.0) < 0.02


def test_deterministic_per_key_and_distinct_keys():
    x = jnp.ones((8, 128), jnp.bfloat16)
    a = np.asarray(fast_dropout(jax.random.PRNGKey(2), x, 0.5))
    b = np.asarray(fast_dropout(jax.random.PRNGKey(2), x, 0.5))
    c = np.asarray(fast_dropout(jax.random.PRNGKey(3), x, 0.5))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_rbg_keys_supported():
    x = jnp.ones((8, 64), jnp.float32)
    out = np.asarray(fast_dropout(jax.random.key(0, impl="rbg"), x, 0.4))
    assert ((out == 0) | np.isclose(out, 1 / 0.6)).all()


def test_odd_channel_fallback():
    x = jnp.ones((16, 33), jnp.float32)
    out = np.asarray(fast_dropout(jax.random.PRNGKey(4), x, 0.5))
    assert out.shape == (16, 33)
    assert ((out == 0) | np.isclose(out, 2.0)).all()
