"""Fused LayerNorm parity vs flax nn.LayerNorm (interpret mode on CPU).

The Pallas path is additionally hardware-parity-tested in
tests/test_tpu_numerics.py; here the kernel runs in interpret mode and the
module's two code paths are checked against flax semantics (f32
fast-variance statistics, f32 scale/bias application, input-dtype output).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

import cswin_simam_unet_tpu.ops.pallas_layernorm as pln
from cswin_simam_unet_tpu.models.layers import FusedLayerNorm


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pln._INTERPRET
    pln._INTERPRET = True
    yield
    pln._INTERPRET = old


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale)


# every (tokens, C) geometry the 512^2 flagship model uses
GEOMS = [(64, 64), (256, 128), (1024, 256), (64, 512)]


@pytest.mark.parametrize("L,C", GEOMS)
def test_matches_flax_forward_and_grads(L, C):
    x = _rand((2, L, C), 0)
    scale = _rand((C,), 1, 0.3) + 1.0
    bias = _rand((C,), 2, 0.1)

    def f_ours(x, s, b):
        return jnp.sum(jnp.sin(pln.layer_norm(x, s, b, 1e-5)))

    ln = nn.LayerNorm(epsilon=1e-5)

    def f_flax(x, s, b):
        return jnp.sum(jnp.sin(
            ln.apply({"params": {"scale": s, "bias": b}}, x)))

    out = pln.layer_norm(x, scale, bias, 1e-5)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    g = jax.grad(f_ours, argnums=(0, 1, 2))(x, scale, bias)
    gw = jax.grad(f_flax, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_, name in zip(g, gw, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_module_param_paths_and_path_equivalence():
    """Both module paths own params at the nn.LayerNorm paths and agree."""
    x = _rand((2, 64, 64), 3)
    m_ref = FusedLayerNorm(use_pallas=False, name="norm1")
    params = m_ref.init(jax.random.PRNGKey(0), x)
    leaves = params["params"]
    assert set(leaves.keys()) == {"scale", "bias"}
    assert leaves["scale"].shape == (64,)
    y_ref = m_ref.apply(params, x)
    y_pl = FusedLayerNorm(use_pallas=True, name="norm1").apply(params, x)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-6)


def test_bf16_output_dtype():
    x = _rand((2, 64, 64), 4).astype(jnp.bfloat16)
    scale = jnp.ones((64,), jnp.float32)
    bias = jnp.zeros((64,), jnp.float32)
    out = pln.layer_norm(x, scale, bias, 1e-5)
    assert out.dtype == jnp.bfloat16
