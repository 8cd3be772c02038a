"""Model-level 2-D spatial sharding of the flagship CSWin(-SimAM)-UNet.

Round 3 shipped the op-level pieces (``parallel/spatial.py``: H-sharded
UNet, halo'd convs, psum'd stats, cross-chip stripe attention); this module
composes them into an end-to-end H-sharded CSWin forward/backward —
VERDICT r03 #5 — so the beyond-HBM story for the *flagship* no longer
rests on segmented recompute alone.  The image's height dim is sharded
over a device axis; per shard the communication is exactly:

* **halo exchanges** (``lax.ppermute``) for the conv stem (7x7/s4: 2 rows
  up, 1 down), the merge convs (3x3/s2: 1 up), the CARAFE encoder convs
  (3x3: 1 each way) and the CARAFE reassembly's 1-row tap neighbourhood;
* **K/V all-gathers** for the window geometries that span shards (vertical
  stripes and the global stage-4 window — ``spatial_stripe_attention``);
  horizontal stripes stay entirely shard-local;
* **psum** for SimAM's global per-channel moments.

Everything else — LayerNorm, qkv/proj/MLP matmuls, residuals, the skip
pyramid (ref train_cswinunet_segmentation.py:632-642, here an explicit
H-sharded carry), the 1x1 head — is shard-local by construction.

Like ``spatial_unet_apply``, this is an op-for-op *interpreter* over the
standard flax parameter pytree of :class:`models.cswin.CSWinUNet` (the
XLA/non-Pallas path), so no separate distributed model definition can
drift out of sync; eval-mode fwd and grad equal the single-device
``model.apply`` (tests/test_spatial_cswin.py, 8-device CPU mesh).  Round
5 adds TRAIN mode (``train=True``): the flagship recipe's dropout /
attn-dropout / drop-path run with position-keyed masks (see the
train-mode note below), proven N-shard == 1-shard for fwd AND gradients.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble
from cswin_simam_unet_tpu.ops.pallas_layernorm import _ln_reference
from cswin_simam_unet_tpu.parallel.spatial import (
    spatial_simam,
    spatial_stripe_attention,
)

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Train-mode stochastic layers (VERDICT r04 #4).
#
# Masks are keyed on GLOBAL positions (token index / window index), not on
# the shard-local layout: a mask bit depends only on (base key, site id,
# global position), so an H-sharded run draws exactly the bits a 1-shard
# run draws for the same elements.  That makes train-mode fwd+bwd on 2-/4-
# shard meshes bit-comparable to the single-shard oracle
# (tests/test_spatial_cswin.py), the same way the flash kernel's in-kernel
# PRNG is sweep-order-independent.  NB: the *stream* necessarily differs
# from ``model.apply``'s flax dropout rng fold order — same stance as the
# segmented executor (train/segmented.py): a different, equally valid
# sample of the identical dropout distribution; eval-mode equality to
# ``model.apply`` is what ties the interpreter to the model.
# ---------------------------------------------------------------------------


class _SiteCounter:
    """Deterministic dropout-site numbering (construction order), plus the
    global geometry the mask helpers need to draw shard-invariant bits."""

    def __init__(self, key, n_shards: int):
        self.key = key
        self.n_shards = n_shards
        self.n = 0

    def next_key(self):
        k = jax.random.fold_in(self.key, self.n)
        self.n += 1
        return k


def _token_dropout(sites: "_SiteCounter | None", rate: float, x, tok0):
    """Inverted dropout on a (B, L_local, C) slab.  The keep mask is drawn
    at the GLOBAL token shape from the site key and the shard's slab is
    sliced out, so every shard (and the 1-shard oracle) sees exactly the
    same bits for the same tokens — mask generation is a single vectorised
    bernoulli (compile-cheap), redundant across shards by design (the
    generator is a tiny fraction of block compute)."""
    if sites is None or rate == 0.0:
        return x
    site_key = sites.next_key()
    B, L, C = x.shape
    keep_p = 1.0 - rate
    keep = jax.random.bernoulli(site_key, keep_p,
                                (B, L * sites.n_shards, C))
    keep = lax.dynamic_slice_in_dim(keep, tok0, L, axis=1)
    return jnp.where(keep, x / keep_p, 0.0).astype(x.dtype)


def _drop_path(sites: "_SiteCounter | None", rate: float, x):
    """Per-sample stochastic depth; the (B,1,1) mask has no spatial extent,
    so every shard draws the identical mask from the site key alone."""
    if sites is None or rate == 0.0:
        return x
    keep_p = 1.0 - rate
    mask = jax.random.bernoulli(sites.next_key(), keep_p,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep_p, 0.0).astype(x.dtype)


def _window_attn_dropout(site_key, rate: float, attn, win0, nwin_global: int,
                         B: int):
    """Attention-prob dropout for shard-LOCAL (horizontal-stripe) windows:
    bits drawn at the global window count, the shard's contiguous window
    block sliced out (``attn``: (B * nwin_local, heads, Nq, Nk),
    window-minor within the leading dim)."""
    Bw, heads, Nq, Nk = attn.shape
    nwin_local = Bw // B
    keep_p = 1.0 - rate
    keep = jax.random.bernoulli(site_key, keep_p,
                                (B, nwin_global, heads, Nq, Nk))
    keep = lax.dynamic_slice_in_dim(keep, win0, nwin_local, axis=1)
    return jnp.where(keep.reshape(attn.shape), attn / keep_p,
                     0.0).astype(attn.dtype)


def _vstripe_attn_dropout(site_key, rate: float, attn, H: int, row0,
                          H_local: int, wsp: int, B: int):
    """Attention-prob dropout for vertical-stripe / global windows: the
    windows are global on every shard but only the shard's q rows are
    computed — bits drawn at (B, nwin, heads, H, wsp, Nk) and the local
    row slab sliced, so an N-shard run reproduces the 1-shard masks.

    ``attn``: (B * nwin, heads, H_local * wsp, Nk) with q tokens h-major.
    """
    Bw, heads, Nq, Nk = attn.shape
    nwin = Bw // B
    keep_p = 1.0 - rate
    keep = jax.random.bernoulli(site_key, keep_p,
                                (B, nwin, heads, H, wsp, Nk))
    keep = lax.dynamic_slice_in_dim(keep, row0, H_local, axis=3)
    return jnp.where(keep.reshape(attn.shape), attn / keep_p,
                     0.0).astype(attn.dtype)


def _attention_train(q, k, v, lepe_kernel, *, H: int, W: int, hsp: int,
                     wsp: int, num_heads: int, attn_drop: float,
                     sites: _SiteCounter, axis_name: str, n_shards: int):
    """Train-mode twin of :func:`parallel.spatial.spatial_stripe_attention`
    with position-keyed attention dropout (one dropout site per call —
    consumed from ``sites`` whether or not the rate is 0, keeping site
    numbering independent of the rate configuration)."""
    from cswin_simam_unet_tpu.ops.attention import (
        lepe_depthwise, stripe_attention)
    from cswin_simam_unet_tpu.ops.windows import img2windows, windows2img

    site_key = sites.next_key()
    B, L_local, C = q.shape
    H_local = H // n_shards
    d_head = C // num_heads
    scale = d_head ** -0.5
    shard = lax.axis_index(axis_name)

    def heads(wins):
        Bw, N, _ = wins.shape
        return wins.reshape(Bw, N, num_heads, d_head).transpose(0, 2, 1, 3)

    if hsp < H:
        # horizontal stripes: whole windows shard-local, global window id =
        # (global window-row) * (W/wsp) + window-col
        if H_local % hsp:
            raise ValueError(
                f"horizontal stripe height {hsp} must divide the local "
                f"slab height {H_local} (H={H}, n_shards={n_shards})")
        nwin_local = (H_local // hsp) * (W // wsp)
        nwin_global = nwin_local * n_shards
        win0 = shard * nwin_local
        wins = [img2windows(t.reshape(B, H_local, W, C), hsp, wsp)
                for t in (q, k, v)]
        qh, kh, vh = (heads(w) for w in wins)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        if attn_drop > 0.0:
            attn = _window_attn_dropout(site_key, attn_drop, attn, win0,
                                        nwin_global, B)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                         preferred_element_type=jnp.float32).astype(q.dtype)
        lepe = heads(lepe_depthwise(wins[2], lepe_kernel, hsp, wsp))
        out = out + lepe
        Bw, _, N, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
        img = windows2img(out, hsp, wsp, H_local, W)
        return img.reshape(B, L_local, C)

    # vertical stripes (wsp < W) or global window: K/V all-gathered, q local
    k_full = lax.all_gather(k.reshape(B, H_local, W, C), axis_name,
                            axis=1, tiled=True)
    v_full = lax.all_gather(v.reshape(B, H_local, W, C), axis_name,
                            axis=1, tiled=True)
    q_wins = img2windows(q.reshape(B, H_local, W, C), H_local, wsp)
    k_wins = img2windows(k_full, H, wsp)
    v_wins = img2windows(v_full, H, wsp)
    qh, kh, vh = heads(q_wins), heads(k_wins), heads(v_wins)

    lepe = lepe_depthwise(v_wins, lepe_kernel, H, wsp)
    Bw = lepe.shape[0]
    row0 = shard * H_local
    lepe_loc = lax.dynamic_slice_in_dim(
        lepe.reshape(Bw, H, wsp, C), row0, H_local, axis=1)
    lepe_h = heads(lepe_loc.reshape(Bw, H_local * wsp, C))

    attn = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh,
                      preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    if attn_drop > 0.0:
        attn = _vstripe_attn_dropout(site_key, attn_drop, attn, H, row0,
                                     H_local, wsp, B)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    out = out + lepe_h
    N_loc = H_local * wsp
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N_loc, C)
    img = windows2img(out, H_local, wsp, H_local, W)
    return img.reshape(B, L_local, C)


def _halo_pad_asym(x: jnp.ndarray, top: int, bot: int, axis_name: str,
                   n_shards: int) -> jnp.ndarray:
    """Pad the local H-slab (axis 1) with ``top`` rows from the shard above
    and ``bot`` rows from the shard below; zeros at the global image edges
    (``ppermute`` yields zeros for devices with no source) — matching the
    SAME-conv zero padding of the unsharded op."""
    parts = [x]
    if top:
        fwd = [(i, i + 1) for i in range(n_shards - 1)]
        parts.insert(0, lax.ppermute(x[:, -top:], axis_name, fwd))
    if bot:
        bwd = [(i + 1, i) for i in range(n_shards - 1)]
        parts.append(lax.ppermute(x[:, :bot], axis_name, bwd))
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x


def _spatial_conv(x, kernel, bias, stride: int, pad: int, axis_name: str,
                  n_shards: int):
    """Strided SAME conv on an H-sharded NHWC slab.  Output row i of a
    k-tap/stride-s/pad-p conv reads input rows [s*i - p, s*i - p + k), so
    the halo is ``p`` rows above and ``k - p - s`` below."""
    k = kernel.shape[0]
    xp = _halo_pad_asym(x, pad, k - pad - stride, axis_name, n_shards)
    y = lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), window_strides=(stride, stride),
        padding=((0, 0), (pad, pad)), dimension_numbers=_DN)
    return y + bias.astype(x.dtype)


def _ln(tokens, p):
    return _ln_reference(tokens, p["scale"], p["bias"], 1e-5)


def _dense(x, p):
    y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _cswin_block(p: Dict[str, Any], tokens, *, dim: int, reso: int,
                 num_heads: int, split_size: int, last: bool,
                 axis_name: str, n_shards: int,
                 sites: "_SiteCounter | None" = None, drop: float = 0.0,
                 attn_drop: float = 0.0, dp_rate: float = 0.0, tok0=0):
    """CSWinBlock (models/layers.py::CSWinBlock, ref :301-370) on an
    H-sharded token slab.  ``sites=None``: deterministic (dropout/
    drop-path inert).  With a site counter the block runs train mode with
    position-keyed masks (see the module-level train-mode note)."""
    last = last or reso == split_size
    h = _ln(tokens, p["norm1"])
    qkv = _dense(h, p["qkv"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    kw = dict(H=reso, W=reso, axis_name=axis_name, n_shards=n_shards)
    if sites is not None:
        attn_fn = functools.partial(_attention_train, sites=sites,
                                    attn_drop=attn_drop, **kw)
    else:
        attn_fn = functools.partial(spatial_stripe_attention, **kw)
    if last:
        out = attn_fn(q, k, v, p["attn0"]["get_v_kernel"], hsp=reso,
                      wsp=reso, num_heads=num_heads)
        out = out + p["attn0"]["get_v_bias"].astype(out.dtype)
    else:
        half = dim // 2
        o0 = attn_fn(q[..., :half], k[..., :half], v[..., :half],
                     p["attn0"]["get_v_kernel"], hsp=reso, wsp=split_size,
                     num_heads=num_heads // 2)
        o0 = o0 + p["attn0"]["get_v_bias"].astype(o0.dtype)
        o1 = attn_fn(q[..., half:], k[..., half:], v[..., half:],
                     p["attn1"]["get_v_kernel"], hsp=split_size, wsp=reso,
                     num_heads=num_heads // 2)
        o1 = o1 + p["attn1"]["get_v_bias"].astype(o1.dtype)
        out = jnp.concatenate([o0, o1], axis=-1)
    x = tokens + _drop_path(sites, dp_rate, _dense(out, p["proj"]))
    h2 = _ln(x, p["norm2"])
    m = jax.nn.gelu(_dense(h2, p["mlp"]["fc1"]), approximate=False)
    m = _token_dropout(sites, drop, m, tok0)
    m = _dense(m, p["mlp"]["fc2"])
    m = _token_dropout(sites, drop, m, tok0)
    return x + _drop_path(sites, dp_rate, m)


def _spatial_carafe(p: Dict[str, Any], tokens, *, H: int, W: int, S: int,
                    use_simam: bool, axis_name: str, n_shards: int):
    """CARAFE upsample (models/layers.py::CARAFE, XLA path) on an H-sharded
    token slab: kernel-prediction convs with a 1-row halo, reassembly on a
    1-row-extended slab (crop back), out-conv linear part applied low-res
    (the module's own commute trick), bias after, SimAM via psum."""
    B, Ll, C = tokens.shape
    Hl = H // n_shards
    img = tokens.reshape(B, Hl, W, C)
    t = jnp.dot(img, p["down"]["kernel"][0, 0].astype(img.dtype)) \
        + p["down"]["bias"].astype(img.dtype)
    enc = _spatial_conv(t, p["encoder"]["kernel"], p["encoder"]["bias"],
                        1, 1, axis_name, n_shards)
    y = jnp.dot(img, p["out"]["kernel"][0, 0].astype(img.dtype))
    y_ext = _halo_pad_asym(y, 1, 1, axis_name, n_shards)
    enc_ext = jnp.pad(enc, ((0, 0), (1, 1), (0, 0), (0, 0)))
    up_ext = carafe_reassemble(y_ext, enc_ext, S, 3)
    up = up_ext[:, S:-S]
    up = up + p["out"]["bias"].astype(up.dtype)
    if use_simam:
        up = spatial_simam(up, axis_name)
    C_out = up.shape[-1]
    return up.reshape(B, Hl * S * W * S, C_out)


def _cswin_forward(params, x, dropout_key=None, *, img_size: int,
                   embed_dim: int, depth: Sequence[int],
                   split_size: Sequence[int], num_heads: Sequence[int],
                   use_simam: bool, drop_rate: float = 0.0,
                   attn_drop_rate: float = 0.0, drop_path_rate: float = 0.0,
                   train: bool = False, axis_name: str, n_shards: int,
                   capture: "dict | None" = None):
    """Op-for-op mirror of CSWinUNet.__call__ (XLA path) on one H-slab
    (models/cswin.py:149-266).  ``train=True`` runs the stochastic layers
    with position-keyed masks (module-level note); ``capture`` (a dict)
    collects per-stage token outputs for the equality-localisation tests."""
    E = embed_dim
    resos = [img_size // (4 * 2 ** i) for i in range(4)]
    sites = _SiteCounter(dropout_key, n_shards) if train else None
    # stochastic-depth schedule, encoder stage and decoder twin sharing
    # dpr indices exactly like the model (models/cswin.py, ref :514)
    import numpy as np
    total = int(np.sum(list(depth)))
    dpr = [float(r) for r in np.linspace(0.0, drop_path_rate, total)]
    starts = np.concatenate([[0], np.cumsum(list(depth))]).astype(int)

    def snap(name, tokens):
        if capture is not None:
            capture[name] = tokens

    # patch embed: conv 7x7 / s4 / p2 (+ SimAM) + LN
    img = _spatial_conv(x, params["embed_conv"]["kernel"],
                        params["embed_conv"]["bias"], 4, 2,
                        axis_name, n_shards)
    if use_simam:
        img = spatial_simam(img, axis_name)
    B = img.shape[0]
    tokens = img.reshape(B, -1, E)
    tokens = _ln(tokens, params["embed_norm"])
    if sites is not None:
        tok0_1 = lax.axis_index(axis_name) * tokens.shape[1]
        tokens = _token_dropout(sites, drop_rate, tokens, tok0_1)
    snap("embed", tokens)

    def run_stage(tokens, s, name, last):
        tok0 = lax.axis_index(axis_name) * tokens.shape[1]
        for i in range(depth[s]):
            tokens = _cswin_block(
                params[f"{name}_{i}"], tokens, dim=E * 2 ** s, reso=resos[s],
                num_heads=num_heads[s], split_size=split_size[s], last=last,
                axis_name=axis_name, n_shards=n_shards, sites=sites,
                drop=drop_rate, attn_drop=attn_drop_rate,
                dp_rate=dpr[starts[s] + i], tok0=tok0)
        snap(name, tokens)
        return tokens

    skips = []
    for s in range(4):
        last = s == 3
        tokens = run_stage(tokens, s, f"stage{s + 1}", last)
        if not last:
            skips.append(tokens)
            mp = params[f"merge{s + 1}"]
            Hl = resos[s] // n_shards
            img = tokens.reshape(B, Hl, resos[s], E * 2 ** s)
            img = _spatial_conv(img, mp["conv"]["kernel"],
                                mp["conv"]["bias"], 2, 1, axis_name,
                                n_shards)
            if use_simam:
                img = spatial_simam(img, axis_name)
            tokens = _ln(img.reshape(B, -1, E * 2 ** (s + 1)), mp["norm"])
            snap(f"merge{s + 1}", tokens)
    tokens = _ln(tokens, params["norm"])

    tokens = run_stage(tokens, 3, "stage_up4", True)
    for s in (2, 1, 0):
        dim = E * 2 ** s
        tokens = _spatial_carafe(
            params[f"upsample{s + 2}"], tokens, H=resos[s + 1],
            W=resos[s + 1], S=2, use_simam=use_simam, axis_name=axis_name,
            n_shards=n_shards)
        snap(f"upsample{s + 2}", tokens)
        tokens = jnp.concatenate([skips[s], tokens], axis=-1)
        tokens = _dense(tokens, params[f"concat_linear{s + 2}"])
        tokens = run_stage(tokens, s, f"stage_up{s + 1}", False)
    tokens = _ln(tokens, params["norm_up"])

    tokens = _spatial_carafe(
        params["upsample1"], tokens, H=resos[0], W=resos[0], S=4,
        use_simam=use_simam, axis_name=axis_name, n_shards=n_shards)
    Hl_out = img_size // n_shards
    img = tokens.reshape(B, Hl_out, img_size, E)
    w = params["output"]["kernel"][0, 0].astype(img.dtype)
    return jnp.dot(img, w)  # bias-free 1x1 head (ref :603)


def validate_spatial_cswin(img_size: int, n_shards: int,
                           split_size: Sequence[int]) -> None:
    """Every stage's resolution must shard evenly, and each non-last
    stage's horizontal stripe height must divide its local slab (vertical
    stripes and the global window all-gather instead — no constraint)."""
    for s in range(4):
        reso = img_size // (4 * 2 ** s)
        if reso % n_shards:
            raise ValueError(
                f"stage {s + 1} resolution {reso} not divisible by "
                f"n_shards={n_shards} (img_size {img_size})")
        if s < 3 and (reso // n_shards) % split_size[s]:
            raise ValueError(
                f"stage {s + 1} local slab {reso // n_shards} rows not "
                f"divisible by horizontal stripe height {split_size[s]}; "
                f"reduce the spatial axis or change split_size")


def spatial_cswin_apply(model, variables, x: jnp.ndarray, mesh: Mesh,
                        axis_name: str = "spatial", train: bool = False,
                        dropout_rng: "jax.Array | None" = None,
                        capture_stages: bool = False):
    """Run CSWin-UNet's forward with H sharded over ``mesh[axis_name]`` —
    input (B, H, W, 3) partitioned on dim 1, logits returned with the same
    layout.

    ``train=False``: numerically equal to ``model.apply(variables, x,
    train=False)`` (fwd + grad asserted on the 8-device CPU mesh in
    tests/test_spatial_cswin.py).  ``train=True`` (requires
    ``dropout_rng``): runs the flagship training recipe's stochastic
    layers (drop / attn-drop / drop-path from the model config) with
    position-keyed masks, so any N-shard run equals the 1-shard run of
    this same function bit-for-bit in distribution AND in drawn masks —
    the train-mode oracle-equality lever.  The dropout *stream* differs
    from ``model.apply``'s flax fold order (documented trade, as in
    train/segmented.py).

    ``capture_stages=True`` additionally returns a dict of per-stage token
    outputs (encoder stages, merges, decoder stages, upsamples) so tests
    can localise where sharded-collective accumulation drift enters.
    """
    n_shards = mesh.shape[axis_name]
    validate_spatial_cswin(model.img_size, n_shards, model.split_size)
    if train and dropout_rng is None:
        raise ValueError("train=True requires dropout_rng")
    kw = dict(
        img_size=model.img_size, embed_dim=model.embed_dim,
        depth=tuple(model.depth), split_size=tuple(model.split_size),
        num_heads=tuple(model.num_heads), use_simam=model.use_simam,
        drop_rate=float(model.drop_rate),
        attn_drop_rate=float(model.attn_drop_rate),
        drop_path_rate=float(model.drop_path_rate), train=train,
        axis_name=axis_name, n_shards=n_shards)

    def body(params, x, key):
        cap = {} if capture_stages else None
        out = _cswin_forward(params, x, key, capture=cap, **kw)
        if capture_stages:
            return out, cap
        return out

    key = dropout_rng if dropout_rng is not None \
        else jax.random.PRNGKey(0)
    out_spec = P(None, axis_name, None, None)
    cap_spec = P(None, axis_name, None)  # token slabs (B, L_local, C)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(None, axis_name, None, None), P()),
        out_specs=(out_spec, cap_spec) if capture_stages else out_spec,
        check_vma=False)
    return sharded(variables["params"], x, key)
