"""flat_grouped_dot: forward equals the kron(I_G, W) matmul bit-for-bit,
and the custom row-major VJP matches autodiff of that matmul."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_simam_unet_tpu.ops.flat_dot import flat_grouped_dot


def _kron_ref(x, w, G):
    return jnp.dot(x, jnp.kron(jnp.eye(G, dtype=x.dtype), w.astype(x.dtype)))


@pytest.mark.parametrize("G,C,F", [(16, 64, 1), (16, 64, 4), (4, 8, 3),
                                   (1, 16, 2)])
def test_forward_matches_kron(G, C, F):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 5, G * C), jnp.float32)
    w = jnp.asarray(rng.randn(C, F), jnp.float32)
    got = flat_grouped_dot(x, w, G)
    ref = _kron_ref(x, w, G)
    assert got.shape == (2, 5, 5, G * F)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("G,C,F", [(16, 64, 1), (16, 64, 4), (4, 8, 3)])
def test_grads_match_autodiff(G, C, F):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4, 4, G * C), jnp.float32)
    w = jnp.asarray(rng.randn(C, F), jnp.float32)
    dy = jnp.asarray(rng.randn(2, 4, 4, G * F), jnp.float32)

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) * dy)

    gx, gw = jax.grad(loss(lambda x, w: flat_grouped_dot(x, w, G)),
                      argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss(lambda x, w: _kron_ref(x, w, G)),
                      argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-6,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=1e-5,
                               atol=1e-5)


def test_bf16_forward_and_grad_finite():
    rng = np.random.RandomState(2)
    G, C, F = 16, 64, 1
    x = jnp.asarray(rng.randn(1, 8, 8, G * C), jnp.bfloat16)
    w = jnp.asarray(rng.randn(C, F), jnp.float32)
    y = flat_grouped_dot(x, w, G)
    assert y.dtype == jnp.bfloat16
    gw = jax.grad(lambda w: jnp.sum(
        flat_grouped_dot(x, w, G).astype(jnp.float32)))(w)
    assert gw.dtype == jnp.float32
    assert np.isfinite(np.asarray(gw)).all()
