"""Fused flat-head op (ops/pallas_simam_head.py) vs the unfused chain.

On CPU the op runs its pure-XLA reference path (interpret mode), so these
tests pin (a) that the reference IS the pre-fusion composition
bias-add -> simam_flat -> flat_grouped_dot, bit-for-bit, and (b) that the
custom-VJP plumbing returns gradients matching autodiff of that chain.
The Mosaic lowering itself is verified on hardware in
tests/test_tpu_numerics.py::test_simam_head_on_tpu.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cswin_simam_unet_tpu.ops.pallas_simam_head as sh
from cswin_simam_unet_tpu.ops.flat_dot import flat_grouped_dot
from cswin_simam_unet_tpu.ops.simam import simam_flat


@pytest.fixture(autouse=True)
def interpret_mode():
    old = sh._INTERPRET
    sh._INTERPRET = True
    yield
    sh._INTERPRET = old


def _inputs(seed=0, B=2, H=8, W=8, G=16, C=8, F=1):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, H, W, G * C).astype(np.float32))
    b = jnp.asarray(rs.randn(C).astype(np.float32))
    w = jnp.asarray(rs.randn(C, F).astype(np.float32))
    return x, b, w


def _unfused(x, b, w, G, gate):
    xb = x + jnp.tile(b, G)
    if gate:
        xb = simam_flat(xb, G)
    return flat_grouped_dot(xb, w, G)


@pytest.mark.parametrize("gate", [True, False])
def test_reference_matches_unfused_chain(gate):
    G = 16
    x, b, w = _inputs()
    want = _unfused(x, b, w, G, gate)
    got = sh._reference(x, b, w, G, 1e-4, gate)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("gate", [True, False])
@pytest.mark.parametrize("F", [1, 3])
def test_vjp_matches_unfused_chain(gate, F):
    G = 16
    x, b, w = _inputs(F=F)

    def fused_loss(x, b, w):
        return jnp.sum(jnp.sin(sh.simam_head(x, b, w, G, 1e-4, gate)))

    def chain_loss(x, b, w):
        return jnp.sum(jnp.sin(_unfused(x, b, w, G, gate)))

    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(x, b, w)
    gc = jax.grad(chain_loss, argnums=(0, 1, 2))(x, b, w)
    for a, c in zip(gf, gc):
        scale = np.max(np.abs(np.asarray(c))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(c) / scale, atol=5e-4)


def test_head_rejects_wide_heads():
    x, b, w = _inputs(F=9)
    with pytest.raises(ValueError, match="at most 8 classes"):
        sh.simam_head(x, b, w, 16, 1e-4, True)


def test_fused_head_module_param_compatibility():
    """FusedSimAMHead(name='output') keeps the {'output': {'kernel'}} tree
    path and (1, 1, C, F) shape of the unfused PointwiseConv head, so
    checkpoints and the torch importer/exporter are unaffected."""
    from cswin_simam_unet_tpu.models.layers import FusedSimAMHead
    m = FusedSimAMHead(features=1, groups=16, use_simam=True)
    x, b, _ = _inputs(C=8)
    vs = m.init(jax.random.PRNGKey(0), x, b)
    assert vs["params"]["kernel"].shape == (1, 1, 8, 1)
    out = m.apply(vs, x, b)
    assert out.shape == (2, 8, 8, 16)
    want = _unfused(x, b, vs["params"]["kernel"][0, 0], 16, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)
