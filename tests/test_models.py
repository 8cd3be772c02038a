"""Model-level tests: shapes, parameter counts vs the reference, SimAM
variants, geometry validation, gradient flow (SURVEY.md §4.1).

Param counts use ``jax.eval_shape`` (no compute); everything that executes
runs under ``jax.jit`` — eager op-by-op dispatch on the single-core CPU host
costs minutes per model call (measured: the old eager version of this file
took 200s+; see tests/test_spatial.py for the same fix).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.models import UNet, CSWinUNet, validate_geometry
from cswin_simam_unet_tpu.train import segmentation_loss


def n_params_abstract(model, shape):
    """Parameter count via eval_shape — no FLOPs, no init compile."""
    v = jax.eval_shape(
        lambda r: model.init(r, jnp.zeros(shape, jnp.float32), train=False),
        jax.random.PRNGKey(0))
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(v["params"]))


TINY_CSWIN = dict(img_size=64, embed_dim=16, depth=(1, 1, 2, 1),
                  split_size=(1, 2, 2, 2), num_heads=(2, 2, 2, 2))


def jit_init(model, x, train=False):
    return jax.jit(lambda r: model.init(r, x, train=train))(
        jax.random.PRNGKey(0))


def test_unet_param_count_matches_reference():
    # 31,043,521 params, verified by instantiating the reference
    # (train_unet_segmentation.py:221-250; SURVEY.md §6)
    assert n_params_abstract(UNet(), (1, 32, 32, 3)) == 31_043_521


def test_cswin_param_count_matches_reference():
    # 23,567,980 params, resolution-independent
    # (train_cswinunet_segmentation.py:489-688; SURVEY.md §6)
    assert n_params_abstract(CSWinUNet(img_size=224),
                             (1, 224, 224, 3)) == 23_567_980


def test_unet_forward_shapes():
    m = UNet(n_classes=1)
    x = jnp.zeros((2, 64, 64, 3))
    v = jit_init(m, x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (2, 64, 64, 1)
    probs = jax.jit(lambda v, x: m.predict(v, x))(v, x)
    assert np.all(np.asarray(probs) >= 0) and np.all(np.asarray(probs) <= 1)


def test_unet_simam_variant_runs_and_is_param_free():
    x = jnp.ones((1, 32, 32, 3))
    # SimAM adds no parameters
    assert (n_params_abstract(UNet(), x.shape)
            == n_params_abstract(UNet(use_simam=True), x.shape))
    m = UNet(use_simam=True)
    v = jit_init(m, x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (1, 32, 32, 1)


def test_cswin_tiny_forward_and_grad():
    m = CSWinUNet(**TINY_CSWIN)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    dtype=jnp.float32)
    y = jnp.asarray((np.random.RandomState(1).rand(2, 64, 64, 1) > 0.5),
                    dtype=jnp.float32)
    v = jit_init(m, x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (2, 64, 64, 1)

    def loss_fn(params):
        logits = m.apply({"params": params}, x, train=False)
        return segmentation_loss(logits, y)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every parameter receives gradient signal somewhere
    nonzero = sum(int(np.any(np.asarray(g) != 0)) for g in flat)
    assert nonzero / len(flat) > 0.95


def test_cswin_simam_variant_is_param_free():
    x = jnp.ones((1, 64, 64, 3))
    assert (n_params_abstract(CSWinUNet(**TINY_CSWIN), x.shape)
            == n_params_abstract(CSWinUNet(use_simam=True, **TINY_CSWIN),
                                 x.shape))
    m = CSWinUNet(use_simam=True, **TINY_CSWIN)
    v = jit_init(m, x)
    out = jax.jit(lambda v, x: m.apply(v, x, train=False))(v, x)
    assert out.shape == (1, 64, 64, 1)


def test_cswin_multiclass_head():
    m = CSWinUNet(num_classes=4, **TINY_CSWIN)
    x = jnp.zeros((1, 64, 64, 3))
    v = jit_init(m, x)
    probs = jax.jit(lambda v, x: m.predict(v, x))(v, x)
    assert probs.shape == (1, 64, 64, 4)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_geometry_validation():
    # 512 with default splits must fail loudly (the reference crashes with an
    # opaque view error instead — SURVEY.md §6)
    with pytest.raises(ValueError, match="split_size"):
        validate_geometry(512, (1, 2, 7, 7))
    validate_geometry(512, (1, 2, 8, 8))
    validate_geometry(448, (1, 2, 7, 7))
    with pytest.raises(ValueError, match="divisible by 32"):
        validate_geometry(100, (1, 2, 7, 7))


@pytest.mark.parametrize("remat", [True, "dots"])
def test_remat_variants_match_baseline(remat):
    # memory-frugal block remat (bool) and the dots_saveable policy must be
    # numerically identical to the no-remat forward AND gradients
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    dtype=jnp.float32)
    base = CSWinUNet(**TINY_CSWIN)
    m = CSWinUNet(remat=remat, **TINY_CSWIN)
    v = jit_init(base, x)

    def loss(model, params):
        return jnp.mean(jnp.square(
            model.apply({"params": params}, x, train=False)))

    l0, g0 = jax.jit(jax.value_and_grad(lambda p: loss(base, p)))(v["params"])
    l1, g1 = jax.jit(jax.value_and_grad(lambda p: loss(m, p)))(v["params"])
    assert abs(float(l0) - float(l1)) < 1e-6
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5,
                                   err_msg=jax.tree_util.keystr(p0))


def test_dropout_train_eval_modes():
    m = CSWinUNet(drop_rate=0.3, attn_drop_rate=0.3, drop_path_rate=0.3,
                  **TINY_CSWIN)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    dtype=jnp.float32)
    v = jit_init(m, x)
    fwd_eval = jax.jit(lambda v, x: m.apply(v, x, train=False))
    # eval: deterministic, no rng needed
    o1 = fwd_eval(v, x)
    o2 = fwd_eval(v, x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # train: stochastic across rng keys
    fwd_train = jax.jit(
        lambda v, x, r: m.apply(v, x, train=True, rngs={"dropout": r}))
    t1 = fwd_train(v, x, jax.random.PRNGKey(1))
    t2 = fwd_train(v, x, jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
