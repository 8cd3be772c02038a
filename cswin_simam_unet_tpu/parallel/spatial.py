"""2-D spatial sharding (context-parallel equivalent) via halo exchange.

The reference has no parallelism of any kind (SURVEY.md §2.5); its scaling
mechanism for large images is purely architectural.  This module is the
framework's CP equivalent for images beyond single-chip HBM: the image's
**height dim is sharded over a device axis**, every op runs on its local
H-slab, and the only communication is

* a 1-row (per 3x3 conv) **halo exchange** with the two neighbour shards,
  expressed as ``lax.ppermute`` shifts compiled onto ICI, and
* ``lax.psum`` for the *global* spatial statistics (BatchNorm train-mode
  moments, SimAM per-channel energy moments).

Everything else in the UNet family is shard-local by construction:
max-pool 2x2/s2 and transpose-conv k2/s2 never cross an even-row boundary,
1x1 convs and activations are elementwise over H.  Activation memory is
O(H / n_shards) per chip, so the max trainable resolution scales linearly
with the spatial axis.

Built with ``shard_map`` (communication is explicit and auditable), fully
differentiable — ``ppermute``'s transpose is the reverse shift and
``psum``'s is a broadcast, so ``jax.grad`` of the sharded forward equals
the single-device gradient (asserted in tests/test_spatial.py on the
8-device CPU mesh).

Reuses the *existing* flax parameter pytree of :class:`models.unet.UNet` —
the interpreter below mirrors UNet.__call__ op-for-op (ref
train_unet_segmentation.py:177-250) so no separate "distributed model"
definition can drift out of sync.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_DN = ("NHWC", "HWIO", "NHWC")


def halo_pad(x: jnp.ndarray, halo: int, axis_name: str,
             n_shards: int) -> jnp.ndarray:
    """Pad the local H-slab (axis 1) with ``halo`` rows from each neighbour.

    Boundary shards receive zeros (``ppermute`` yields zeros for devices
    with no source), matching SAME-conv zero padding of the global image.
    """
    fwd = [(i, i + 1) for i in range(n_shards - 1)]   # send down
    bwd = [(i + 1, i) for i in range(n_shards - 1)]   # send up
    top = lax.ppermute(x[:, -halo:], axis_name, fwd)  # rows above my slab
    bot = lax.ppermute(x[:, :halo], axis_name, bwd)   # rows below my slab
    return jnp.concatenate([top, x, bot], axis=1)


def spatial_conv3x3(x, kernel, bias, axis_name: str, n_shards: int):
    """SAME 3x3 stride-1 conv on an H-sharded NHWC slab (halo = 1)."""
    xp = halo_pad(x, 1, axis_name, n_shards)
    y = lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), window_strides=(1, 1),
        padding=((0, 0), (1, 1)), dimension_numbers=_DN)
    return y + bias.astype(x.dtype)


def _psum_moments(x, axes, axis_name):
    """Global (mean, biased var, count) over local-reduce ``axes`` + the
    spatial device axis, in f32."""
    xf = x.astype(jnp.float32)
    cnt = 1.0
    for a in axes:
        cnt *= x.shape[a]
    s1 = lax.psum(jnp.sum(xf, axis=axes), axis_name)
    s2 = lax.psum(jnp.sum(jnp.square(xf), axis=axes), axis_name)
    n = cnt * lax.psum(1, axis_name) if 1 in axes else cnt
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    return mean, var, n


def spatial_batchnorm(x, params, stats, axis_name: str, train: bool,
                      eps: float = 1e-5):
    """BatchNorm on an H-sharded slab.

    Eval: elementwise with running stats (shard-local).  Train: batch
    moments over (N, H_global, W) via psum — the biased variance, exactly
    what torch/flax normalise with in train mode.  Running-stat *updates*
    are not produced here (the spatial path trains with its own moments;
    exporting running stats from a sharded run is out of scope and
    documented).
    """
    if train:
        mean, var, _ = _psum_moments(x, (0, 1, 2), axis_name)
    else:
        mean = stats["mean"].astype(jnp.float32)
        var = stats["var"].astype(jnp.float32)
    inv = lax.rsqrt(var + eps) * params["scale"].astype(jnp.float32)
    out = (x.astype(jnp.float32) - mean) * inv + params["bias"].astype(
        jnp.float32)
    return out.astype(x.dtype)


def spatial_simam(x, axis_name: str, lam: float = 1e-4):
    """SimAM (ops/simam.py) with per-(batch, channel) moments over the
    *global* H x W plane via psum."""
    H_local, W = x.shape[1], x.shape[2]
    xf = x.astype(jnp.float32)
    s1 = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis_name)
    s2 = lax.psum(jnp.sum(jnp.square(xf), axis=(1, 2), keepdims=True),
                  axis_name)
    N = H_local * W * lax.psum(1, axis_name)
    mu = s1 / N
    v = (s2 - N * jnp.square(mu)) / (N - 1)
    e_inv = jnp.square(xf - mu) / (4.0 * (v + lam)) + 0.5
    return (xf * jax.nn.sigmoid(e_inv)).astype(x.dtype)


def _double_conv(p: Dict[str, Any], bs: Dict[str, Any], x, use_simam: bool,
                 axis_name: str, n_shards: int, train: bool):
    """DoubleConv (ref :177-191): (conv3x3 -> BN -> ReLU) x 2 [+ SimAM]."""
    for i in (1, 2):
        x = spatial_conv3x3(x, p[f"conv{i}"]["kernel"], p[f"conv{i}"]["bias"],
                            axis_name, n_shards)
        x = spatial_batchnorm(x, p[f"bn{i}"], bs[f"bn{i}"], axis_name, train)
        x = jax.nn.relu(x)
    if use_simam:
        x = spatial_simam(x, axis_name)
    return x


def _down(p, bs, x, use_simam, axis_name, n_shards, train):
    """MaxPool 2x2/s2 (shard-local: even H_local) then DoubleConv."""
    x = lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                          "VALID")
    return _double_conv(p["conv"], bs["conv"], x, use_simam, axis_name,
                        n_shards, train)


def _up(p, bs, x, skip, axis_name, n_shards, train):
    """ConvTranspose k2/s2 (shard-local), concat [skip, x], DoubleConv."""
    y = lax.conv_transpose(x, p["up"]["kernel"].astype(x.dtype), (2, 2),
                           "VALID", dimension_numbers=_DN)
    y = y + p["up"]["bias"].astype(x.dtype)
    y = jnp.concatenate([skip, y], axis=-1)  # skip FIRST (ref :217)
    return _double_conv(p["conv"], bs["conv"], y, False, axis_name,
                        n_shards, train)


def _unet_forward(params, batch_stats, x, *, use_simam: bool, train: bool,
                  axis_name: str, n_shards: int):
    """Op-for-op mirror of models/unet.py::UNet.__call__ on one H-slab."""
    args = (axis_name, n_shards, train)
    bs = batch_stats
    x1 = _double_conv(params["inc"], bs.get("inc", {}), x, use_simam, *args)
    x2 = _down(params["down1"], bs.get("down1", {}), x1, use_simam, *args)
    x3 = _down(params["down2"], bs.get("down2", {}), x2, use_simam, *args)
    x4 = _down(params["down3"], bs.get("down3", {}), x3, use_simam, *args)
    x5 = _down(params["down4"], bs.get("down4", {}), x4, use_simam, *args)
    x = _up(params["up1"], bs.get("up1", {}), x5, x4, *args)
    x = _up(params["up2"], bs.get("up2", {}), x, x3, *args)
    x = _up(params["up3"], bs.get("up3", {}), x, x2, *args)
    x = _up(params["up4"], bs.get("up4", {}), x, x1, *args)
    w = params["outc"]["kernel"][0, 0].astype(x.dtype)
    logits = jnp.dot(x, w) + params["outc"]["bias"].astype(x.dtype)
    return logits


def spatial_stripe_attention(q, k, v, lepe_kernel, *, H: int, W: int,
                             hsp: int, wsp: int, num_heads: int,
                             scale: float | None = None,
                             axis_name: str = "spatial",
                             n_shards: int = 1):
    """Cross-shaped-window attention on H-sharded tokens (shard_map body).

    ``q, k, v``: (B, L_local, C) token slabs — rows ``[r, r + H/n)`` of the
    global (H, W) token grid on shard ``r // (H/n)``.  Window geometry per
    :func:`ops.windows.stripe_geometry`; semantics match the single-device
    oracle :func:`ops.attention.stripe_attention` (ref
    train_cswinunet_segmentation.py:220-298).

    Communication pattern (the CP mechanism of SURVEY.md §2.5):

    * **horizontal stripes** (hsp < H): windows are hsp-row bands — entirely
      shard-local when ``H_local % hsp == 0``; zero communication.
    * **vertical stripes / global window** (hsp == H): every window spans
      all shards, so K and V rows are **all-gathered over the spatial axis**
      (one ``lax.all_gather`` each, riding ICI) while Q stays local — each
      chip computes softmax(q_local k_fullᵀ) v_full for its rows only.
      Attention score memory is O(H_local · N_window) per chip, so peak
      memory still scales down linearly with the axis.  (A ring/online-
      softmax variant would drop the O(H·W·C) gathered K/V too; at CSWin's
      stripe widths the gather is a few MB and latency-optimal, so the ring
      is deliberately not built.)
    """
    from cswin_simam_unet_tpu.ops.attention import (
        lepe_depthwise, stripe_attention)
    from cswin_simam_unet_tpu.ops.windows import img2windows, windows2img

    B, L_local, C = q.shape
    H_local = H // n_shards
    if L_local != H_local * W:
        raise ValueError(f"local token count {L_local} != {H_local}*{W}")
    d_head = C // num_heads
    if scale is None:
        scale = d_head ** -0.5

    if hsp < H:
        # horizontal stripes: whole windows live on one shard
        if H_local % hsp:
            raise ValueError(
                f"horizontal stripe height {hsp} must divide the local slab "
                f"height {H_local} (H={H}, n_shards={n_shards})")
        return stripe_attention(q, k, v, lepe_kernel, H=H_local, W=W,
                                hsp=hsp, wsp=wsp, num_heads=num_heads,
                                scale=scale)

    # vertical stripes (wsp < W) or the global window (wsp == W)
    k_full = lax.all_gather(k.reshape(B, H_local, W, C), axis_name,
                            axis=1, tiled=True)     # (B, H, W, C)
    v_full = lax.all_gather(v.reshape(B, H_local, W, C), axis_name,
                            axis=1, tiled=True)

    def heads(wins):
        Bw, N, _ = wins.shape
        return wins.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)

    q_wins = img2windows(q.reshape(B, H_local, W, C), H_local, wsp)
    k_wins = img2windows(k_full, H, wsp)
    v_wins = img2windows(v_full, H, wsp)
    qh, kh, vh = heads(q_wins), heads(k_wins), heads(v_wins)

    # LePE for local rows from the gathered stripe (window-edge zero pad)
    lepe = lepe_depthwise(v_wins, lepe_kernel, H, wsp)
    Bw = lepe.shape[0]
    row0 = lax.axis_index(axis_name) * H_local
    lepe_loc = lax.dynamic_slice_in_dim(
        lepe.reshape(Bw, H, wsp, C), row0, H_local, axis=1)
    lepe_h = heads(lepe_loc.reshape(Bw, H_local * wsp, C))

    attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out + lepe_h
    N_loc = H_local * wsp
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N_loc, C)
    img = windows2img(out, H_local, wsp, H_local, W)
    return img.reshape(B, L_local, C)


def validate_spatial_geometry(height: int, n_shards: int,
                              levels: int = 4) -> None:
    """The UNet's pool pyramid constrains H: every level's local slab must
    keep whole, even rows.  Raise with the fix spelled out (the same
    fail-fast stance as the CSWin split-size validation)."""
    step = n_shards * (2 ** levels)
    if height % step != 0:
        raise ValueError(
            f"spatial sharding needs H divisible by n_shards * 2^levels = "
            f"{step} (got H={height}, n_shards={n_shards}); pad the input "
            f"or reduce the spatial axis")


def spatial_unet_apply(model, variables, x: jnp.ndarray, mesh: Mesh,
                       axis_name: str = "spatial", train: bool = False):
    """Run UNet's forward with H sharded over ``mesh[axis_name]``.

    ``model`` is the flax :class:`~cswin_simam_unet_tpu.models.unet.UNet`
    whose ``variables`` were initialised normally (params replicated); the
    input's H dim is partitioned over the spatial axis and the logits come
    back with the same layout.  Numerically equal to
    ``model.apply(variables, x, train=train)`` (asserted on the 8-device
    CPU mesh in tests/test_spatial.py, fwd and grad).
    """
    n_shards = mesh.shape[axis_name]
    validate_spatial_geometry(x.shape[1], n_shards)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    body = functools.partial(
        _unet_forward, use_simam=model.use_simam, train=train,
        axis_name=axis_name, n_shards=n_shards)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name, None, None)),
        out_specs=P(None, axis_name, None, None),
        check_vma=False)
    return sharded(params, batch_stats, x)
