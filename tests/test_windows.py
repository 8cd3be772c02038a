"""Window layout primitive tests (SURVEY.md §4.1: round-trip + ordering)."""

import numpy as np
import jax.numpy as jnp

from cswin_simam_unet_tpu.ops.windows import (
    img2windows,
    windows2img,
    stripe_geometry,
    tokens_to_nhwc,
    nhwc_to_tokens,
)
import pytest


@pytest.mark.parametrize("H,W,hsp,wsp", [
    (8, 8, 8, 1),    # vertical stripes
    (8, 8, 1, 8),    # horizontal stripes
    (8, 8, 8, 8),    # global window
    (12, 12, 4, 3),  # generic rectangular windows
])
def test_roundtrip(H, W, hsp, wsp):
    x = jnp.asarray(np.random.RandomState(0).randn(2, H, W, 5))
    wins = img2windows(x, hsp, wsp)
    assert wins.shape == (2 * (H // hsp) * (W // wsp), hsp * wsp, 5)
    back = windows2img(wins, hsp, wsp, H, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_window_ordering_matches_reference_convention():
    # Reference enumerates windows row-major over (H//hsp, W//wsp) and tokens
    # row-major within a window (train_cswinunet_segmentation.py:199-206).
    H = W = 4
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    wins = np.asarray(img2windows(x, 2, 2))[..., 0]
    # first window is the top-left 2x2 block, row-major
    np.testing.assert_array_equal(wins[0], [0, 1, 4, 5])
    # second window is the top-right block
    np.testing.assert_array_equal(wins[1], [2, 3, 6, 7])
    # third window starts the second window-row
    np.testing.assert_array_equal(wins[2], [8, 9, 12, 13])


def test_stripe_geometry():
    assert stripe_geometry(28, 7, -1) == (28, 28)
    assert stripe_geometry(28, 7, 0) == (28, 7)
    assert stripe_geometry(28, 7, 1) == (7, 28)
    with pytest.raises(ValueError):
        stripe_geometry(28, 7, 2)


def test_token_conversions():
    x = jnp.asarray(np.random.randn(3, 4, 5, 6))
    t = nhwc_to_tokens(x)
    assert t.shape == (3, 20, 6)
    np.testing.assert_array_equal(np.asarray(tokens_to_nhwc(t, 4, 5)),
                                  np.asarray(x))
    with pytest.raises(ValueError):
        tokens_to_nhwc(t, 5, 5)
