"""Registry configs: every BASELINE.json row (configs.py CONFIGS) builds a
model that traces at its real geometry.

The reference hardcodes each run's constants inside ``main()``
(train_unet_segmentation.py:406-423, train_cswinunet_segmentation.py:846-862)
and will crash only at runtime on bad geometry (e.g. 512^2 with the default
splits, SURVEY.md §6); here construction + abstract tracing validates every
registered config without paying a compile.
"""

import jax
import jax.numpy as jnp
import pytest

from cswin_simam_unet_tpu.configs import CONFIGS, build_model, get_config


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_config_builds_and_traces(name):
    cfg = get_config(name)
    model = build_model(cfg.model, cfg.image_size)
    size = cfg.image_size
    x = jax.ShapeDtypeStruct((1, size, size, cfg.model.in_channels),
                             jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    variables = jax.eval_shape(
        lambda r, xx: model.init(r, xx, train=False), rng, x)
    out = jax.eval_shape(
        lambda v, xx: model.apply(v, xx, train=False), variables, x)
    assert out.shape == (1, size, size, cfg.model.n_classes), (name, out.shape)


def test_reference_default_param_counts():
    """The two reference-default configs carry the reference's exact
    parameter mass (train_unet_segmentation.py:221-250 = 31,043,521;
    train_cswinunet_segmentation.py:489-688 = 23,567,980)."""
    expected = {"unet": 31_043_521, "cswinunet": 23_567_980}
    for name, count in expected.items():
        cfg = get_config(name)
        model = build_model(cfg.model, cfg.image_size)
        x = jax.ShapeDtypeStruct(
            (1, cfg.image_size, cfg.image_size, 3), jnp.float32)
        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        variables = jax.eval_shape(
            lambda r, xx: model.init(r, xx, train=False), rng, x)
        n = sum(int(jnp.prod(jnp.array(p.shape)))
                for p in jax.tree.leaves(variables["params"]))
        assert n == count, (name, n)


def test_get_config_overrides():
    cfg = get_config("cswin_simam_512_dp", batch_size=8,
                     model_drop_rate=0.0)
    assert cfg.batch_size == 8
    assert cfg.model.drop_rate == 0.0
    assert cfg.model.attn_drop_rate == 0.3  # untouched sibling field
    # base registry entry is not mutated
    assert CONFIGS["cswin_simam_512_dp"].batch_size == 16


def test_unknown_config_raises():
    with pytest.raises(KeyError):
        get_config("nope")


def test_segmented_flag_tristate():
    """ADVICE r03: --segmented must be tri-state so a segmented-by-default
    config (cswin_simam_2048) can be A/B'd monolithically via
    --no-segmented, and the default follows the config."""
    from cswin_simam_unet_tpu.cli import build_argparser
    p = build_argparser()
    base = ["train", "--image-dir", "x", "--mask-dir", "y"]
    assert p.parse_args(base).segmented is None
    assert p.parse_args(base + ["--segmented"]).segmented is True
    assert p.parse_args(base + ["--no-segmented"]).segmented is False
