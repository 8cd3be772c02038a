"""Torch-direction weight export: flax variables -> reference state_dict.

Closes the parity loop from our side: weights trained in this framework can
be loaded into the original PyTorch scripts (train_unet_segmentation.py /
train_cswinunet_segmentation.py) with ``load_state_dict(strict=True)``.

Two properties are asserted:
* exact round-trip: export(import(sd)) == sd for a reference state_dict
  (all layout transposes/flips are lossless inverses);
* forward parity in the user direction: a flax-initialised model exported
  to torch produces the same probabilities as our own forward.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cswin_simam_unet_tpu.compat import (  # noqa: E402
    export_cswin_variables,
    export_unet_variables,
    import_cswin_state_dict,
    import_unet_state_dict,
)
from cswin_simam_unet_tpu.models import CSWinUNet, UNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402

DEPTH = (1, 1, 2, 1)
SPLIT = (1, 2, 2, 2)
HEADS = (2, 2, 2, 2)


def _assert_state_dicts_equal(got, want):
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]),
                                      err_msg=k)


def test_unet_export_roundtrip_exact():
    mod = load_reference("unet")
    torch.manual_seed(0)
    ref = mod.UNet(n_channels=3, n_classes=1)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    out = export_unet_variables(import_unet_state_dict(sd))
    _assert_state_dicts_equal(out, sd)


def test_cswin_export_roundtrip_exact():
    mod = load_reference("cswin")
    torch.manual_seed(0)
    ref = mod.CSWinTransformer(
        img_size=64, in_chans=3, num_classes=1, embed_dim=64,
        depth=list(DEPTH), split_size=list(SPLIT), num_heads=list(HEADS),
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    out = export_cswin_variables(import_cswin_state_dict(sd, depth=DEPTH),
                                 depth=DEPTH)
    _assert_state_dicts_equal(out, sd)


def test_cswin_flax_init_exports_into_reference():
    # the user direction: train here, load into the original script
    model = CSWinUNet(img_size=64, embed_dim=64, depth=DEPTH,
                      split_size=SPLIT, num_heads=HEADS)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x),
                           train=False)
    variables = jax.device_get(variables)
    sd = export_cswin_variables(variables, depth=DEPTH)

    mod = load_reference("cswin")
    ref = mod.CSWinTransformer(
        img_size=64, in_chans=3, num_classes=1, embed_dim=64,
        depth=list(DEPTH), split_size=list(SPLIT), num_heads=list(HEADS),
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0)
    missing, unexpected = ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    assert not missing and not unexpected
    ref.eval()

    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.predict(
        jax.tree_util.tree_map(jnp.asarray, variables), jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=2e-4, atol=2e-4)
