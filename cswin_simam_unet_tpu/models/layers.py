"""Shared flax building blocks for the CSWin-UNet model family.

Pure linen modules in NHWC / (B, L, C) token layouts.  Each module documents
the reference component it provides parity with (file:line cites refer to
``/root/reference/train_cswinunet_segmentation.py`` unless noted).  Unlike
the reference, nothing here stores activations on ``self`` — skip pyramids
are returned explicitly so every forward is pure and re-entrant under jit.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from cswin_simam_unet_tpu.ops.attention import stripe_attention
from cswin_simam_unet_tpu.ops.carafe import carafe_reassemble
from cswin_simam_unet_tpu.ops.simam import simam
from cswin_simam_unet_tpu.ops.windows import stripe_geometry, tokens_to_nhwc, nhwc_to_tokens

Dtype = Any

# torch.nn.Linear/Conv default init is kaiming-uniform; the reference then
# re-initialises every Linear with trunc_normal(std=0.02) and LayerNorm/BN to
# unit/zero (ref :607-614).  We init Dense kernels the same way; convs keep
# flax's lecun_normal (a fresh-training choice — parity tests always run with
# imported weights, so init never affects parity).
dense_init = nn.initializers.truncated_normal(stddev=0.02)


class FusedLayerNorm(nn.Module):
    """``nn.LayerNorm``-compatible LayerNorm (param names "scale"/"bias",
    f32 fast-variance statistics), with an optional fused Pallas kernel.

    Measured dead end (v5e, 512^2 CSWin step): the fused kernel
    (ops/pallas_layernorm.py, hardware-parity-tested in
    tests/test_tpu_numerics.py) is a net LOSS here — +6.7 ms/step when all
    ~100 LNs use it (~40 us pallas dispatch each beats XLA's free fusion of
    small LNs into neighbouring chains), and still +2 ms when only the
    >=4M-element stage-1/2 LNs do (the custom-call boundary breaks XLA's
    fusion of the LN into the qkv/MLP matmul epilogues).  So ``use_pallas``
    deliberately defaults OFF and nothing sets it; the kernel is kept for
    geometries where a standalone LN is not surrounded by fusable ops.
    """

    epsilon: float = 1e-5
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cswin_simam_unet_tpu.ops.pallas_layernorm import (
            _ln_reference,
            layer_norm,
        )
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        x = x.astype(self.dtype)
        if not self.use_pallas:
            return _ln_reference(x, scale, bias, self.epsilon)
        return layer_norm(x, scale, bias, self.epsilon)


class FastDropout(nn.Module):
    """``nn.Dropout``-compatible inverted dropout backed by
    :func:`cswin_simam_unet_tpu.ops.dropout.fast_dropout` — u16 threshold
    bits instead of one u32 per element, halving the mask generator's HBM
    traffic on the big MLP hidden tensors (~1 ms/step at the 512^2
    flagship).  Same rng collection ("dropout"), same train/eval gating."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        from cswin_simam_unet_tpu.ops.dropout import fast_dropout
        return fast_dropout(self.make_rng("dropout"), x, self.rate)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm ``DropPath`` semantics).

    The reference wraps residual branches in ``DropPath(drop_path)`` when the
    rate is positive (ref :344).  At train time each *sample* keeps its
    residual with probability ``1 - rate`` and is rescaled by ``1/keep``.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 rate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``rate`` (a traced scalar) overrides the static ``self.rate`` —
        used by the scan-over-blocks path, where the per-block stochastic-
        depth rate is a scanned input rather than a Python constant."""
        if rate is None:
            if self.rate == 0.0 or deterministic:
                return x
            rate = self.rate
        elif deterministic:
            return x
        keep = 1.0 - rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    """Linear -> GELU(exact) -> Dropout -> Linear -> Dropout (ref :180-196)."""

    hidden_features: int
    out_features: int
    drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, kernel_init=dense_init,
                     dtype=self.dtype, name="fc1")(x)
        # torch nn.GELU defaults to the exact erf form.
        x = nn.gelu(x, approximate=False)
        x = FastDropout(self.drop)(x, deterministic)
        x = nn.Dense(self.out_features, kernel_init=dense_init,
                     dtype=self.dtype, name="fc2")(x)
        x = FastDropout(self.drop)(x, deterministic)
        return x


class LePEAttention(nn.Module):
    """One stripe/global attention branch with LePE (ref :220-298).

    Owns the depthwise 3x3 ``get_v`` kernel (ref :244) and dispatches the
    compute to :func:`cswin_simam_unet_tpu.ops.attention.stripe_attention`
    (XLA path) or the fused Pallas kernel.
    """

    dim: int
    resolution: int
    idx: int  # -1 global, 0 vertical stripes, 1 horizontal stripes
    split_size: int
    num_heads: int
    attn_drop: float = 0.0
    qk_scale: Optional[float] = None
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        hsp, wsp = stripe_geometry(self.resolution, self.split_size, self.idx)
        # Depthwise conv params, HWIO with feature_group_count == dim.
        kernel = self.param("get_v_kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, self.dim), jnp.float32)
        bias = self.param("get_v_bias", nn.initializers.zeros, (self.dim,),
                          jnp.float32)
        rng = None
        if self.attn_drop > 0.0 and not deterministic:
            rng = self.make_rng("dropout")
        # All geometries route to the v2 banded-batched kernel, including
        # width-1 stripes: the earlier per-window-loop kernel lost to the
        # XLA oracle there (1.48 vs 1.21 ms/branch), but batching the
        # windows of a tile into one dot_general per head flipped it —
        # in-step A/B at the 512^2 flagship: stage-1-on-XLA 147.1 vs
        # stage-1-on-Pallas 152.3 img/s (benchmarks/micro_attn_device.py,
        # bench.py, 2026-08-18).
        # Kernel dispatch by window size: windows <= 2048 tokens run the v2
        # whole-window kernel (its (TW, N, N) score block stays small and
        # beats tiling there); larger windows run the flash kernel
        # (ops/pallas_attention_flash.py) whose VMEM and Mosaic compile
        # scale with the 512^2 tile, not N^2 — the round-3 guard that
        # routed >2048-token windows to the XLA oracle (2048^2 stage-4
        # global attention, Mosaic compile >25 min) is replaced by a real
        # kernel.  The XLA oracle remains the fallback only when even the
        # flash working set cannot fit VMEM.
        attn_kw = dict(
            H=self.resolution, W=self.resolution, hsp=hsp, wsp=wsp,
            num_heads=self.num_heads, scale=self.qk_scale,
            attn_drop=self.attn_drop, deterministic=deterministic,
            dropout_rng=rng,
        )
        impl = stripe_attention
        if self.use_pallas:
            if hsp * wsp <= 2048:
                from cswin_simam_unet_tpu.ops.pallas_attention_v2 import (
                    stripe_attention_pallas_v2,
                )
                impl = stripe_attention_pallas_v2
            else:
                from cswin_simam_unet_tpu.ops.pallas_attention_flash import (
                    _VMEM_LIMIT,
                    flash_vmem_bytes,
                    stripe_attention_pallas_flash,
                )
                itemsize = jnp.dtype(self.dtype).itemsize
                if flash_vmem_bytes(hsp * wsp, self.dim,
                                    itemsize) <= _VMEM_LIMIT:
                    impl = stripe_attention_pallas_flash
        out = impl(q, k, v, kernel.astype(self.dtype), **attn_kw)
        # get_v bias: constant per channel, conv(v)+b — add after the window
        # attention output since lepe enters additively.
        return out + bias.astype(out.dtype)


class CSWinBlock(nn.Module):
    """Pre-norm CSWin transformer block (ref :301-370).

    Two parallel half-channel stripe branches (vertical + horizontal) form
    the cross-shaped receptive field; the last stage runs one global-window
    branch.  ``reso == split_size`` auto-promotes to last stage (ref :317).
    """

    dim: int
    reso: int
    num_heads: int
    split_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    last_stage: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 drop_path_rate: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        C = self.dim
        last = self.last_stage or (self.reso == self.split_size)
        h = FusedLayerNorm(dtype=self.dtype,
                           name="norm1")(x)
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, kernel_init=dense_init,
                       dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        branch_kw = dict(
            resolution=self.reso, split_size=self.split_size,
            attn_drop=self.attn_drop, qk_scale=self.qk_scale,
            use_pallas=self.use_pallas, dtype=self.dtype,
        )
        if last:
            attn_out = LePEAttention(dim=C, idx=-1, num_heads=self.num_heads,
                                     name="attn0", **branch_kw)(
                q, k, v, deterministic)
        else:
            half = C // 2
            o0 = LePEAttention(dim=half, idx=0, num_heads=self.num_heads // 2,
                               name="attn0", **branch_kw)(
                q[..., :half], k[..., :half], v[..., :half], deterministic)
            o1 = LePEAttention(dim=half, idx=1, num_heads=self.num_heads // 2,
                               name="attn1", **branch_kw)(
                q[..., half:], k[..., half:], v[..., half:], deterministic)
            attn_out = jnp.concatenate([o0, o1], axis=-1)

        attn_out = nn.Dense(C, kernel_init=dense_init, dtype=self.dtype,
                            name="proj")(attn_out)
        # NB: the reference defines proj_drop but never applies it (ref :366-368).
        x = x + DropPath(self.drop_path, name="drop_path")(
            attn_out, deterministic, drop_path_rate)
        h2 = FusedLayerNorm(dtype=self.dtype,
                            name="norm2")(x)
        mlp_out = Mlp(int(C * self.mlp_ratio), C, drop=self.drop,
                      dtype=self.dtype, name="mlp")(h2, deterministic)
        x = x + DropPath(self.drop_path, name="drop_path2")(
            mlp_out, deterministic, drop_path_rate)
        return x


class BlockScanCell(nn.Module):
    """One ``lax.scan`` iteration over a stack of identical-geometry
    CSWinBlocks (carry = tokens; scanned input = that block's stochastic-
    depth rate).  Used by ``CSWinUNet(scan_stages=True)``: the deep stages
    (e.g. the reference's 9-block stage 3, ref :514-552) trace ONE block and
    scan it over stacked params instead of unrolling 9 copies into the XLA
    graph — a large compile-time/graph-size win with identical deterministic
    outputs (train-mode dropout streams differ by rng fold order only).
    """

    block_kw: Any  # tuple(sorted(kwargs.items())) minus drop_path
    deterministic: bool
    remat: Any = False

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, dpr_i: jnp.ndarray):
        if self.remat == "dots":
            Block = nn.remat(CSWinBlock, static_argnums=(2,),
                             policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat:
            Block = nn.remat(CSWinBlock, static_argnums=(2,))
        else:
            Block = CSWinBlock
        tokens = Block(**dict(self.block_kw), drop_path=0.0, name="block")(
            tokens, self.deterministic, dpr_i)
        return tokens, None


def scan_blocks(n: int, block_kw: dict, deterministic: bool, remat,
                name: str, unroll: int = 1):
    """A scanned stack of ``n`` CSWinBlocks sharing static ``block_kw``
    (params stacked on axis 0 under ``<name>/block``).  Call with
    ``(tokens, dpr_array)`` where ``dpr_array`` has shape (n,)."""
    kw = dict(block_kw)
    kw.pop("drop_path", None)
    scanned = nn.scan(
        BlockScanCell,
        variable_axes={"params": 0},
        split_rngs={"params": True, "dropout": True},
        in_axes=0, out_axes=0,
        length=n,
        # lax.scan body unrolling: purely an XLA lowering choice (identical
        # math, identical param layout/rng streams) that restores cross-block
        # fusion WITHIN each unrolled group while keeping the executable
        # ~unroll× smaller than the fully unrolled stage — the middle ground
        # the bench orchestrator's hybrid fallback uses (see bench.py).
        unroll=min(unroll, n),
    )
    return scanned(block_kw=tuple(sorted(kw.items(), key=lambda kv: kv[0])),
                   deterministic=deterministic, remat=remat, name=name)


class MergeBlock(nn.Module):
    """Inter-stage downsample: conv3x3/s2 halving resolution, doubling
    channels, then LayerNorm (ref :373-388).  Optionally applies SimAM to the
    conv output (the CSWin-SimAM-UNet variant fuses SimAM into conv paths)."""

    dim_out: int
    use_simam: bool = False
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        img = tokens_to_nhwc(x, H, W)
        img = nn.Conv(self.dim_out, (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)), dtype=self.dtype,
                      name="conv")(img)
        if self.use_simam:
            img = simam(img)
        tokens = nhwc_to_tokens(img)
        return FusedLayerNorm(dtype=self.dtype,
                              name="norm")(tokens)


class PointwiseConv(nn.Module):
    """1x1 conv applied as a channel matmul.

    Parameter-compatible with ``nn.Conv(features, (1, 1))`` (kernel shape
    (1, 1, in, out)) so the torch importer and the standard conv path share
    weights — but lowered as a plain dot on the channel dim, which avoids
    XLA convolution layout-assignment copies on output-resolution tensors.
    """

    features: int
    use_bias: bool = True
    flat_groups: int = 1  # apply to (..., G*C) sub-pixel-major lanes
    defer_bias: bool = False  # return (linear, bias) instead of adding it
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        G = self.flat_groups
        C = x.shape[-1] // G
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, C, self.features), jnp.float32)
        if G > 1:
            # pre-pixel-shuffle layout (lane g*C + c): the same 1x1 conv is
            # the block-diagonal dot kron(I_G, W) — keeps the (1,1,C,out)
            # param (importer-compatible) and avoids the (..., C)-minor
            # reshape whose lane padding forces XLA layout copies.  The
            # custom VJP keeps the weight gradient row-major too (XLA's
            # dot-general dW materialises a channel-major transpose of the
            # full-size flat tensor — see ops/flat_dot.py).
            from cswin_simam_unet_tpu.ops.flat_dot import flat_grouped_dot
            y = flat_grouped_dot(x.astype(self.dtype), kernel[0, 0], G)
        else:
            y = jnp.dot(x, kernel[0, 0].astype(self.dtype))
        if not self.use_bias:
            return (y, None) if self.defer_bias else y
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        b = bias.astype(self.dtype)
        if G > 1:
            b = jnp.tile(b, G)
        if self.defer_bias:
            return y, b
        return y + b


class FusedSimAMHead(nn.Module):
    """Flat segmentation head: CARAFE out-conv bias + optional SimAM +
    grouped 1x1 head conv, fused into one pass over the pre-pixel-shuffle
    map (ops/pallas_simam_head.py).  Parameter-compatible with the unfused
    ``PointwiseConv(features, name="output")`` head (kernel (1, 1, C, F))."""

    features: int
    groups: int
    use_simam: bool = True
    lam: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_flat: jnp.ndarray, bias_vec: jnp.ndarray):
        C = x_flat.shape[-1] // self.groups
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, C, self.features), jnp.float32)
        if self.features > 8:
            # the fused backward packs per-class dW partials into sublane
            # rows (F <= 8); wider heads take the unfused chain
            from cswin_simam_unet_tpu.ops.flat_dot import flat_grouped_dot
            from cswin_simam_unet_tpu.ops.simam import simam_flat
            xb = x_flat + jnp.tile(bias_vec, self.groups)
            if self.use_simam:
                xb = simam_flat(xb, self.groups, self.lam)
            return flat_grouped_dot(xb, kernel[0, 0].astype(self.dtype),
                                    self.groups)
        from cswin_simam_unet_tpu.ops.pallas_simam_head import simam_head
        return simam_head(x_flat, bias_vec, kernel[0, 0], self.groups,
                          self.lam, self.use_simam)


class CARAFEHead(nn.Module):
    """Fully-fused final head: CARAFE reassembly + out-conv bias + optional
    SimAM + grouped 1x1 head conv as ONE custom-VJP op
    (ops/pallas_carafe_head.py) — the backward's full-size ``dacc``
    cotangent never round-trips HBM.  Consumes the ``head_precursor``
    outputs of :class:`CARAFE` (low-res linear map, kernel logits, bias).
    Parameter-compatible with the unfused ``PointwiseConv(features,
    name="output")`` head (kernel (1, 1, C, F))."""

    features: int
    up_factor: int = 4
    use_simam: bool = True
    lam: float = 1e-4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, enc: jnp.ndarray,
                 bias_vec: jnp.ndarray):
        C = y.shape[-1]
        G = self.up_factor ** 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, C, self.features), jnp.float32)
        if self.features > 8:
            # the fused backward packs per-class dW partials into sublane
            # rows (F <= 8); wider heads take the two-op chain
            from cswin_simam_unet_tpu.ops.flat_dot import flat_grouped_dot
            from cswin_simam_unet_tpu.ops.pallas_carafe import (
                carafe_flat_pallas,
            )
            from cswin_simam_unet_tpu.ops.simam import simam_flat
            xb = carafe_flat_pallas(y, enc, self.up_factor, 3)
            xb = xb + jnp.tile(bias_vec, G)
            if self.use_simam:
                xb = simam_flat(xb, G, self.lam)
            return flat_grouped_dot(xb, kernel[0, 0].astype(self.dtype), G)
        from cswin_simam_unet_tpu.ops.pallas_carafe_head import (
            carafe_simam_head,
        )
        return carafe_simam_head(y, enc, bias_vec, kernel[0, 0],
                                 self.up_factor, 3, self.lam,
                                 self.use_simam)


class CARAFE(nn.Module):
    """Content-aware reassembly upsampler (ref :391-486).

    One parameterised module replaces the reference's duplicated
    CARAFE/CARAFE4 classes; ``up_factor`` covers both.  Kernel prediction is
    two convs (1x1 compress to dim/4, KxK expand to S^2*K^2); reassembly is
    :func:`cswin_simam_unet_tpu.ops.carafe.carafe_reassemble`.
    """

    dim_out: int
    up_factor: int = 2
    ksize: int = 3
    use_simam: bool = False
    use_pallas: bool = False
    flat_output: bool = False  # return the pre-pixel-shuffle "scrambled" map
    flat_raw: bool = False  # with flat_output: return (raw map, bias) for a
    #                         fused downstream head (bias/SimAM NOT applied)
    head_precursor: bool = False  # return (linear low-res map, kernel
    #                               logits, bias) — reassembly itself runs
    #                               inside models.layers.CARAFEHead
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
        B, L, C = x.shape
        S = self.up_factor
        img = tokens_to_nhwc(x, H, W)
        t = PointwiseConv(C // 4, dtype=self.dtype, name="down")(img)
        r = self.ksize // 2
        enc = nn.Conv(S ** 2 * self.ksize ** 2,
                      (self.ksize, self.ksize), padding=((r, r), (r, r)),
                      dtype=self.dtype, name="encoder")(t)
        # The 1x1 out-conv's LINEAR part commutes exactly with reassembly:
        # reassembly is a per-pixel scalar-weighted sum over the 3x3
        # neighbourhood, applied uniformly across channels.  Applying W on
        # the LOW-RES map does the dot on S^2x fewer rows and halves the
        # reassembly channel width whenever dim_out < C — same function,
        # same params (ref applies it post-shuffle at full res,
        # train_cswinunet_segmentation.py:432-433).  The bias must be added
        # AFTER reassembly: reassembly zero-pads x at image borders, and a
        # pre-conv zero is not conv(0) = b there (softmax tap weights sum to
        # 1 only over all 9 taps, padded ones included).
        y, b = PointwiseConv(self.dim_out, defer_bias=True,
                             dtype=self.dtype, name="out")(img)
        if self.head_precursor:
            return y, enc, b
        if self.use_pallas and self.ksize == 3:
            from cswin_simam_unet_tpu.ops.pallas_carafe import (
                carafe_flat_pallas,
                carafe_reassemble_pallas,
            )
            if self.flat_output:
                # Stay in pre-pixel-shuffle layout (B, H, W, S^2*dim_out) —
                # lane slot s*dim_out + c is sub-pixel s of channel c.  SimAM
                # pools per real channel across (H, W, S^2) via simam_flat;
                # the caller unscrambles only the tiny final logits tensor,
                # so the full-resolution pixel-shuffle transpose (and the
                # layout copies of a (..., C)-minor reshape) never happen.
                up = carafe_flat_pallas(y, enc, S, self.ksize)
                if self.flat_raw:
                    # bias + SimAM + head dot fuse downstream
                    # (models.layers.FusedSimAMHead)
                    return up, b
                up = up + jnp.tile(b, S * S)
                if self.use_simam:
                    from cswin_simam_unet_tpu.ops.simam import simam_flat
                    up = simam_flat(up, S * S)
                return up  # (B, H, W, S^2*dim_out), sub-pixel-major lanes
            out = carafe_reassemble_pallas(y, enc, S, self.ksize) + b
        else:
            out = carafe_reassemble(y, enc, S, self.ksize) + b
        if self.use_simam:
            out = simam(out)
        return nhwc_to_tokens(out)
