"""Fully-fused CARAFE head op (ops/pallas_carafe_head.py) vs the XLA
oracle: forward + all four gradients (x, enc, bias, w), interpret mode.

Unlike ops/pallas_simam_head.py (whose interpret mode shortcuts to the
reference), this op RUNS its kernels under Pallas interpret on CPU, so the
kernel bodies themselves are covered here; the Mosaic lowering is verified
on hardware in tests/test_tpu_numerics.py::test_carafe_head_on_tpu.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import cswin_simam_unet_tpu.ops.pallas_carafe as pc
import cswin_simam_unet_tpu.ops.pallas_carafe_head as ch


@pytest.fixture(autouse=True)
def interpret_mode():
    old, old_pc = ch._INTERPRET, pc._INTERPRET
    ch._INTERPRET = True
    # NB: pc._INTERPRET stays False — the shared _expand_s helper's
    # indicator-matmul branch is exact under Pallas interpret and is the
    # branch hardware runs
    yield
    ch._INTERPRET, pc._INTERPRET = old, old_pc


def _inputs(B, H, W, C, S, F, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    enc = jnp.asarray(rs.randn(B, H, W, 9 * S * S).astype(np.float32))
    b = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1)
    w = jnp.asarray(rs.randn(C, F).astype(np.float32))
    return x, enc, b, w


GEOMS = [
    # (B, H, W, C, S, F)
    (1, 8, 8, 8, 2, 1),
    (2, 8, 8, 16, 4, 1),   # the flagship's S=4 head, binary
    (1, 16, 8, 8, 2, 4),   # multiple row tiles + multiclass
]


@pytest.mark.parametrize("gate", [True, False])
@pytest.mark.parametrize("B,H,W,C,S,F", GEOMS)
def test_forward_matches_oracle(B, H, W, C, S, F, gate):
    x, enc, b, w = _inputs(B, H, W, C, S, F)
    got = np.asarray(ch.carafe_simam_head(x, enc, b, w, S, 3, 1e-4, gate))
    want = np.asarray(ch._reference(x, enc, b, w, S, 3, 1e-4, gate))
    assert got.shape == (B, H, W, S * S * F)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("gate", [True, False])
@pytest.mark.parametrize("B,H,W,C,S,F", GEOMS)
def test_gradients_match_oracle(B, H, W, C, S, F, gate):
    x, enc, b, w = _inputs(B, H, W, C, S, F, seed=1)

    def loss(fn):
        def f(x, enc, b, w):
            o = fn(x, enc, b, w, S, 3, 1e-4, gate)
            return jnp.sum(o * jnp.cos(o))
        return f

    g_got = jax.grad(loss(ch.carafe_simam_head), argnums=(0, 1, 2, 3))(
        x, enc, b, w)
    g_want = jax.grad(loss(ch._reference), argnums=(0, 1, 2, 3))(
        x, enc, b, w)
    for a, e, name in zip(g_got, g_want, ("dx", "denc", "dbias", "dw")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=f"{name} mismatch")


def test_rejects_wide_heads():
    x, enc, b, w = _inputs(1, 8, 8, 8, 2, 9)
    with pytest.raises(ValueError, match="at most 8 classes"):
        ch.carafe_simam_head(x, enc, b, w, 2)


def test_head_module_param_compatibility():
    """CARAFEHead(name='output') keeps the {'output': {'kernel'}} tree path
    and (1, 1, C, F) shape of the unfused PointwiseConv head, so
    checkpoints and the torch importer/exporter are unaffected."""
    from cswin_simam_unet_tpu.models.layers import CARAFEHead
    x, enc, b, w = _inputs(1, 8, 8, 8, 2, 1)
    m = CARAFEHead(features=1, up_factor=2, use_simam=True)
    vs = m.init(jax.random.PRNGKey(0), x, enc, b)
    assert vs["params"]["kernel"].shape == (1, 1, 8, 1)
    out = m.apply(vs, x, enc, b)
    assert out.shape == (1, 8, 8, 4)
    want = ch._reference(x, enc, b, vs["params"]["kernel"][0, 0], 2, 3,
                         1e-4, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_wide_head_module_fallback():
    """features > 8 routes through the two-op chain (carafe_flat_pallas +
    simam_flat + flat_grouped_dot) with identical results."""
    from cswin_simam_unet_tpu.models.layers import CARAFEHead
    old = pc._INTERPRET
    pc._INTERPRET = True  # the fallback runs pallas_carafe's kernel
    try:
        x, enc, b, w = _inputs(1, 8, 8, 8, 2, 9)
        m = CARAFEHead(features=9, up_factor=2, use_simam=True)
        vs = m.init(jax.random.PRNGKey(0), x, enc, b)
        out = m.apply(vs, x, enc, b)
        assert out.shape == (1, 8, 8, 4 * 9)
        want = ch._reference(x, enc, b, vs["params"]["kernel"][0, 0], 2, 3,
                             1e-4, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
    finally:
        pc._INTERPRET = old
