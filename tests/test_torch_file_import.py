"""Reference torch-checkpoint FILES -> framework (the migration entry).

The reference's only artifact is ``torch.save(model.state_dict())``
(train_unet_segmentation.py:537, train_cswinunet_segmentation.py:992).
These tests assert a user arriving with that ``.pth`` can feed it to the
framework directly (``predict/evaluate --weights model.pth``,
``train --init-weights model.pth``):

* .pth and .npz files import to the same variables the in-memory importer
  produces;
* CLI ``_load_variables`` loads a .pth into an initialised model and the
  forward matches the known-parity import path;
* a mismatched architecture fails with a clear error, not a deep apply
  failure.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cswin_simam_unet_tpu.compat import import_cswin_state_dict  # noqa: E402
from cswin_simam_unet_tpu.compat.io import (  # noqa: E402
    import_torch_file,
    load_state_dict_file,
    merge_imported_variables,
)
from cswin_simam_unet_tpu.models import CSWinUNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402

DEPTH = (1, 1, 2, 1)
SPLIT = (1, 2, 2, 2)
HEADS = (2, 2, 2, 2)


@pytest.fixture(scope="module")
def ref_sd():
    mod = load_reference("cswin")
    torch.manual_seed(0)
    ref = mod.CSWinTransformer(
        img_size=64, in_chans=3, num_classes=1, embed_dim=64,
        depth=list(DEPTH), split_size=list(SPLIT), num_heads=list(HEADS),
        mlp_ratio=4.0, qkv_bias=True, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.0)
    return {k: v.detach().numpy() for k, v in ref.state_dict().items()}


def _assert_tree_equal(got, want):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        got, want)


def test_pth_file_imports_like_in_memory(ref_sd, tmp_path):
    path = str(tmp_path / "ref.pth")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in ref_sd.items()},
               path)
    got = import_torch_file(path, "cswin", depth=DEPTH)
    _assert_tree_equal(got, import_cswin_state_dict(ref_sd, depth=DEPTH))


def test_pth_wrapped_state_dict_key(ref_sd, tmp_path):
    path = str(tmp_path / "wrapped.pth")
    torch.save({"state_dict": {k: torch.from_numpy(v.copy())
                               for k, v in ref_sd.items()},
                "epoch": 7}, path)
    sd = load_state_dict_file(path)
    assert set(sd) == set(ref_sd)


def test_npz_file_imports_like_in_memory(ref_sd, tmp_path):
    path = str(tmp_path / "ref.npz")
    np.savez(path, **ref_sd)
    got = import_torch_file(path, "cswin", depth=DEPTH)
    _assert_tree_equal(got, import_cswin_state_dict(ref_sd, depth=DEPTH))


def test_cli_load_variables_pth_forward_parity(ref_sd, tmp_path):
    """_load_variables on a .pth produces the same forward as applying the
    (golden-parity-tested) in-memory import."""
    from types import SimpleNamespace

    from cswin_simam_unet_tpu.cli import _load_variables

    path = str(tmp_path / "ref.pth")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in ref_sd.items()},
               path)
    model = CSWinUNet(img_size=64, embed_dim=64, depth=DEPTH,
                      split_size=SPLIT, num_heads=HEADS)
    cfg = SimpleNamespace(model=SimpleNamespace(
        family="cswin", depth=DEPTH, in_channels=3))
    variables = _load_variables(model, cfg, 64, path)

    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                    jnp.float32)
    got = jax.jit(lambda v: model.predict(v, x))(variables)
    want_vars = jax.tree_util.tree_map(
        jnp.asarray, import_cswin_state_dict(ref_sd, depth=DEPTH))
    want = jax.jit(lambda v: model.predict(v, x))(want_vars)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mismatched_architecture_fails_clearly(ref_sd, tmp_path):
    path = str(tmp_path / "ref.pth")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in ref_sd.items()},
               path)
    # wrong depth -> importer can't find the extra blocks' tensors
    with pytest.raises(ValueError, match="state_dict|config"):
        import_torch_file(path, "cswin", depth=(1, 2, 9, 1))


def test_merge_validates_structure(ref_sd):
    imported = import_cswin_state_dict(ref_sd, depth=DEPTH)
    model = CSWinUNet(img_size=64, embed_dim=64, depth=DEPTH,
                      split_size=SPLIT, num_heads=HEADS)
    variables = jax.jit(lambda r: model.init(
        r, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False))(
        jax.random.PRNGKey(0))
    merged = merge_imported_variables(variables, imported, source="x.pth")
    _assert_tree_equal(merged["params"], imported["params"])

    bad = {"params": {"nonsense": np.zeros((3,), np.float32)}}
    with pytest.raises(ValueError, match="does not match"):
        merge_imported_variables(variables, bad, source="x.pth")
