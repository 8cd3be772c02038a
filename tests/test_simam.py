"""SimAM energy-attention tests against a naive numpy implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from cswin_simam_unet_tpu.ops.simam import simam


def naive_simam(x, lam=1e-4):
    # per (batch, channel) plane over spatial dims
    B, H, W, C = x.shape
    out = np.empty_like(x)
    n = H * W - 1
    for b in range(B):
        for c in range(C):
            plane = x[b, :, :, c]
            mu = plane.mean()
            d = (plane - mu) ** 2
            v = d.sum() / n
            e_inv = d / (4 * (v + lam)) + 0.5
            out[b, :, :, c] = plane / (1 + np.exp(-e_inv))
    return out


def test_simam_matches_naive():
    x = np.random.RandomState(1).randn(2, 6, 5, 3).astype(np.float32)
    got = np.asarray(simam(jnp.asarray(x)))
    want = naive_simam(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_simam_shape_and_gradient():
    import jax
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 4).astype(np.float32))
    y = simam(x)
    assert y.shape == x.shape
    g = jax.grad(lambda a: jnp.sum(simam(a)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_simam_flat_matches_shuffled():
    # SimAM on the pre-pixel-shuffle layout must equal
    # unshuffle(simam(shuffle(x)))
    from cswin_simam_unet_tpu.ops.simam import simam_flat
    from cswin_simam_unet_tpu.ops.pallas_carafe import (
        _pixel_shuffle, _pixel_unshuffle)
    rs = np.random.RandomState(7)
    S, C = 2, 4
    x_flat = jnp.asarray(rs.randn(2, 4, 4, S * S * C).astype(np.float32))
    want = _pixel_unshuffle(simam(_pixel_shuffle(x_flat, S)), S)
    got = simam_flat(x_flat, groups=S * S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_simam_is_parameter_free_scaling():
    # attention weights are in (0, 1) -> |out| <= |x|
    x = jnp.asarray(np.random.RandomState(3).randn(1, 4, 4, 2).astype(np.float32))
    y = np.asarray(simam(x))
    assert np.all(np.abs(y) <= np.abs(np.asarray(x)) + 1e-7)


def test_simam_flat_custom_vjp_matches_autodiff():
    # simam_flat's hand-written backward (one reduction pass + one
    # elementwise pass, all row-major) must equal autodiff of the
    # shuffle->simam->unshuffle formulation
    from cswin_simam_unet_tpu.ops.simam import simam_flat
    from cswin_simam_unet_tpu.ops.pallas_carafe import (
        _pixel_shuffle, _pixel_unshuffle)
    rs = np.random.RandomState(8)
    S, C = 2, 4
    x_flat = jnp.asarray(rs.randn(2, 4, 4, S * S * C).astype(np.float32))
    cot = jnp.asarray(rs.randn(2, 4, 4, S * S * C).astype(np.float32))

    def f_flat(x):
        return jnp.sum(simam_flat(x, groups=S * S) * cot)

    def f_ref(x):
        return jnp.sum(
            _pixel_unshuffle(simam(_pixel_shuffle(x, S)), S) * cot)

    g = jax.grad(f_flat)(x_flat)
    gw = jax.grad(f_ref)(x_flat)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gw),
                               rtol=2e-4, atol=1e-5)
