"""Pallas CARAFE kernel vs the XLA oracle: forward + both gradients,
across up-factors and sizes (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import cswin_simam_unet_tpu.ops.pallas_carafe as pc
from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pc._INTERPRET
    pc._INTERPRET = True
    yield
    pc._INTERPRET = old


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


@pytest.mark.parametrize("B,H,W,C,S", [
    (2, 8, 8, 16, 2),
    (1, 8, 8, 8, 4),
    (1, 16, 8, 8, 2),   # multiple row tiles
    (2, 4, 4, 4, 4),    # tiny
])
def test_forward_matches_xla(B, H, W, C, S):
    x = _rand((B, H, W, C), 0)
    enc = _rand((B, H, W, 9 * S * S), 1)
    want = np.asarray(carafe_reassemble(x, enc, S, 3))
    got = np.asarray(pc.carafe_reassemble_pallas(x, enc, S, 3))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("B,H,W,C,S", [
    (1, 8, 8, 8, 2),
    (1, 8, 8, 4, 4),
    (1, 16, 8, 8, 2),
])
def test_gradients_match_xla(B, H, W, C, S):
    x = _rand((B, H, W, C), 2)
    enc = _rand((B, H, W, 9 * S * S), 3)

    def loss_xla(x, enc):
        o = carafe_reassemble(x, enc, S, 3)
        return jnp.sum(o * jnp.sin(o))

    def loss_pl(x, enc):
        o = pc.carafe_reassemble_pallas(x, enc, S, 3)
        return jnp.sum(o * jnp.sin(o))

    gw = jax.grad(loss_xla, argnums=(0, 1))(x, enc)
    gg = jax.grad(loss_pl, argnums=(0, 1))(x, enc)
    np.testing.assert_allclose(np.asarray(gg[0]), np.asarray(gw[0]),
                               rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gg[1]), np.asarray(gw[1]),
                               rtol=5e-5, atol=5e-5)


def test_boundary_rows_zero_padded():
    # uniform kernels: corner output = mean over valid (4/9 zero-padded) taps
    B, H, W, C, S = 1, 4, 4, 4, 2
    x = jnp.ones((B, H, W, C))
    enc = jnp.zeros((B, H, W, 9 * S * S))
    out = np.asarray(pc.carafe_reassemble_pallas(x, enc, S, 3))
    np.testing.assert_allclose(out[0, 0, 0, 0], 4.0 / 9.0, rtol=1e-5)
    np.testing.assert_allclose(out[0, 3, 3, 0], 1.0, rtol=1e-5)
