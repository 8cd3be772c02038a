"""CARAFE reassembly tests against a naive per-pixel numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble, extract_neighborhoods


def softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def naive_carafe(x, enc, S, K):
    """x (B,H,W,C); enc (B,H,W,S*S*K*K) channel index k*S^2+s."""
    B, H, W, C = x.shape
    K2 = K * K
    r = K // 2
    kern = softmax(enc.reshape(B, H, W, K2, S * S), axis=3)
    out = np.zeros((B, H * S, W * S, C), x.dtype)
    padded = np.zeros((B, H + 2 * r, W + 2 * r, C), x.dtype)
    padded[:, r:r + H, r:r + W] = x
    for b in range(B):
        for h in range(H):
            for w in range(W):
                neigh = padded[b, h:h + K, w:w + K].reshape(K2, C)
                for i in range(S):
                    for j in range(S):
                        s = i * S + j
                        out[b, h * S + i, w * S + j] = kern[b, h, w, :, s] @ neigh
    return out


def test_extract_neighborhoods_ordering():
    x = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3, 1)
    taps = np.asarray(extract_neighborhoods(x, 3))[0, 1, 1, :, 0]
    # center pixel (1,1): taps must be the full 3x3 block row-major
    np.testing.assert_array_equal(taps, np.arange(9))
    corner = np.asarray(extract_neighborhoods(x, 3))[0, 0, 0, :, 0]
    # corner (0,0): out-of-bounds taps are zero
    np.testing.assert_array_equal(corner, [0, 0, 0, 0, 0, 1, 0, 3, 4])


@pytest.mark.parametrize("S", [2, 4])
def test_carafe_vs_naive(S):
    rs = np.random.RandomState(S)
    B, H, W, C, K = 2, 4, 4, 3, 3
    x = rs.randn(B, H, W, C).astype(np.float32)
    enc = rs.randn(B, H, W, S * S * K * K).astype(np.float32)
    got = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(enc), S, K))
    want = naive_carafe(x, enc, S, K)
    assert got.shape == (B, H * S, W * S, C)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_carafe_uniform_kernel_is_neighborhood_mean():
    # zero logits -> softmax uniform -> every output subpixel is the mean of
    # the 3x3 (zero-padded) neighbourhood
    B, H, W, C, S = 1, 3, 3, 1, 2
    x = np.ones((B, H, W, C), np.float32)
    enc = np.zeros((B, H, W, S * S * 9), np.float32)
    out = np.asarray(carafe_reassemble(jnp.asarray(x), jnp.asarray(enc), S, 3))
    # center pixel: all 9 taps inside -> mean 1; corners: 4 inside -> 4/9
    np.testing.assert_allclose(out[0, 2:4, 2:4, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0, 0], 4.0 / 9.0, rtol=1e-6)
