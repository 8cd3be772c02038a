"""Golden parity: CSWin-UNet vs the PyTorch reference with identical weights.

Uses a reduced-depth config at 64x64 for speed plus one reference-default
224^2 run (marked slow).  drop rates 0 in eval mode, so stochastic layers
are inert and outputs must match deterministically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cswin_simam_unet_tpu.compat import import_cswin_state_dict  # noqa: E402
from cswin_simam_unet_tpu.models import CSWinUNet  # noqa: E402
from reference_loader import load_reference  # noqa: E402


def _make_pair(img_size, depth, split_size, num_heads, embed_dim=64, seed=0):
    mod = load_reference("cswin")
    torch.manual_seed(seed)
    ref = mod.CSWinTransformer(
        img_size=img_size, in_chans=3, num_classes=1, embed_dim=embed_dim,
        depth=list(depth), split_size=list(split_size),
        num_heads=list(num_heads), mlp_ratio=4.0, qkv_bias=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = import_cswin_state_dict(sd, depth=depth)
    ours = CSWinUNet(img_size=img_size, embed_dim=embed_dim, depth=depth,
                     split_size=split_size, num_heads=num_heads)
    return ref, ours, jax.tree_util.tree_map(jnp.asarray, variables)


def _check(ref, ours, variables, img_size, batch=2, seed=0, tol=2e-4):
    x = np.random.RandomState(seed).rand(batch, 3, img_size, img_size)
    x = x.astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x)).numpy()  # (B,1,H,W) sigmoid probs
    got = np.asarray(ours.predict(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    got = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_cswin_parity_small():
    # 64^2, shallow depths; exercises both stripe orientations, the global
    # stage, merges, CARAFE 2x/4x, skip fusion, and the bias-free head.
    ref, ours, variables = _make_pair(
        img_size=64, depth=(1, 1, 2, 1), split_size=(1, 2, 2, 2),
        num_heads=(2, 2, 2, 2), embed_dim=64)
    _check(ref, ours, variables, 64)


def test_cswin_parity_param_count_identical():
    ref, ours, variables = _make_pair(
        img_size=64, depth=(1, 1, 2, 1), split_size=(1, 2, 2, 2),
        num_heads=(2, 2, 2, 2))
    n_ref = sum(p.numel() for p in ref.parameters())
    n_ours = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    assert n_ref == n_ours


@pytest.mark.slow
def test_cswin_parity_default_224():
    # the reference-default architecture at its native 224^2
    ref, ours, variables = _make_pair(
        img_size=224, depth=(1, 2, 9, 1), split_size=(1, 2, 7, 7),
        num_heads=(2, 4, 8, 16))
    _check(ref, ours, variables, 224, batch=1, tol=5e-4)


@pytest.mark.slow
def test_cswin_parity_reference_default_448():
    # The config the reference actually SHIPS and trains: 448^2 input,
    # depth [1,2,9,1], splits [1,2,7,7], heads [2,4,8,16]
    # (train_cswinunet_segmentation.py:850-862,921-933).  Closes the last
    # parity-surface gap: goldens at 64^2/224^2 plus this full-default
    # 448^2 gate cover every geometry the reference can run.
    ref, ours, variables = _make_pair(
        img_size=448, depth=(1, 2, 9, 1), split_size=(1, 2, 7, 7),
        num_heads=(2, 4, 8, 16))
    _check(ref, ours, variables, 448, batch=1, tol=5e-4)
