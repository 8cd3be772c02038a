"""CSWin-UNet: cross-shaped-window transformer encoder/decoder with CARAFE
upsampling, NHWC/token layouts, logits out.

Parity target: ``/root/reference/train_cswinunet_segmentation.py:489-688``
(``CSWinTransformer``).  Same topology: conv7x7/s4 patch embed, 4 encoder
stages of depth [1,2,9,1] with Merge downsampling, mirrored decoder stages
with CARAFE 2x upsamples, skip-concat + Linear fusion, final CARAFE 4x and a
bias-free 1x1 head.  23,567,980 params at the reference config.

TPU-first differences (by design):
* Pure forward — the encoder *returns* its skip pyramid instead of writing
  ``self.x1/x2/x3`` (ref :632-642), so the model is re-entrant under jit.
* Returns logits (reference bakes sigmoid at :688); ``predict`` restores
  probability outputs.
* One parameterised CARAFE replaces the duplicated CARAFE/CARAFE4.
* Optional SimAM fused into the conv paths (patch embed, merge blocks,
  CARAFE) for the CSWin-SimAM-UNet variant (BASELINE.json config 4).
* Optional fused Pallas stripe-attention kernels (``use_pallas``).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cswin_simam_unet_tpu.models.layers import (
    CARAFE,
    CSWinBlock,
    FusedLayerNorm,
    MergeBlock,
    dense_init,
)
from cswin_simam_unet_tpu.ops.simam import simam
from cswin_simam_unet_tpu.ops.windows import (
    nhwc_to_tokens,
    pixel_shuffle,
    tokens_to_nhwc,
)

Dtype = Any


def validate_geometry(img_size: int, split_size: Sequence[int]) -> None:
    """Check the stripe-window divisibility constraints up front.

    The reference fails with an opaque runtime ``view`` error when a stage
    resolution is not divisible by its split size (e.g. 512^2 with the
    default splits [1,2,7,7] — verified in SURVEY.md §6); we validate at
    construction and point at the fix.
    """
    if img_size % 32:
        raise ValueError(f"img_size {img_size} must be divisible by 32")
    for i, ss in enumerate(split_size[:-1]):
        reso = img_size // (4 * 2 ** i)
        if reso % ss:
            raise ValueError(
                f"stage {i + 1} resolution {reso} not divisible by split_size "
                f"{ss} (img_size {img_size}); e.g. 512x512 needs "
                f"split_size=[1,2,8,8]")


def validate_heads(embed_dim: int, num_heads: Sequence[int]) -> None:
    """Head counts must be even for the two-branch stages 1-3 (each branch
    gets heads/2) and divide their stage dims."""
    for i, h in enumerate(num_heads):
        dim = embed_dim * 2 ** i
        last = i == len(num_heads) - 1
        if not last:
            if h % 2:
                raise ValueError(
                    f"stage {i + 1} num_heads {h} must be even (two stripe "
                    f"branches each take num_heads/2)")
            if (dim // 2) % (h // 2):
                raise ValueError(
                    f"stage {i + 1}: branch dim {dim // 2} not divisible by "
                    f"branch heads {h // 2}")
        elif dim % h:
            raise ValueError(
                f"stage {i + 1}: dim {dim} not divisible by num_heads {h}")


def scan_min_depth(scan_stages) -> Optional[int]:
    """Resolve a ``scan_stages`` setting to the minimum stage depth that is
    scanned (None = nothing scanned).  Bool is an int subtype, so it is
    tested first: True scans every multi-block stage (depth > 1)."""
    if scan_stages is True:
        return 2
    if scan_stages is False:
        return None
    return int(scan_stages)


class CSWinUNet(nn.Module):
    """The full CSWin(-SimAM)-UNet (ref ``CSWinTransformer``, :489-688)."""

    img_size: int = 224
    in_chans: int = 3
    num_classes: int = 1
    embed_dim: int = 64
    depth: Sequence[int] = (1, 2, 9, 1)
    split_size: Sequence[int] = (1, 2, 7, 7)
    num_heads: Sequence[int] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    use_simam: bool = False
    use_pallas: bool = False
    # backward rematerialisation per CSWinBlock: False = save everything
    # (fastest at the 512^2 batch-8 flagship), True = recompute the whole
    # block (most memory-frugal; measured 52.5 -> 63.7 ms/step there),
    # "dots" = jax.checkpoint_policies.dots_saveable: matmul outputs are
    # saved, elementwise chains recompute — measured 68.7 ms at the
    # flagship, WORSE than full remat: the stripe-attention custom-vjp
    # kernels are not dots, so their forward re-runs in backward on top of
    # the fused backward kernel.  Both stay available for memory-limited
    # configs (e.g. beyond 1024^2); neither belongs in the fast path.
    remat: Union[bool, str] = False
    # lax.scan over the blocks of each multi-block stage (stacked params,
    # one traced block per stage instead of `depth` unrolled copies).  Same
    # deterministic outputs as the unrolled form (see
    # models/scan_params.py for the param-layout converters); much smaller
    # XLA graph, so cold compiles are far cheaper — the win that matters for
    # very large images where the unrolled graph exhausts the compiler.
    # False = fully unrolled; True = scan every multi-block stage (depth>1);
    # an int N = scan only stages with depth >= N (the "hybrid" form: e.g.
    # N=3 scans just the two 9-block stage-3 twins and unrolls the rest,
    # trading a little fusion for a much smaller executable).
    scan_stages: Union[bool, int] = False
    # lax.scan body unroll factor for scanned stages (identical math and
    # param layout; restores intra-group cross-block fusion — see
    # models/layers.py::scan_blocks)
    scan_unroll: int = 1
    dtype: Dtype = jnp.float32

    def _block_kw(self, stage: int, reso: int, dpr: float,
                  last_stage: bool = False) -> dict:
        dims = [self.embed_dim * 2 ** i for i in range(4)]
        return dict(
            dim=dims[stage], reso=reso, num_heads=self.num_heads[stage],
            split_size=self.split_size[stage], mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            drop=self.drop_rate, attn_drop=self.attn_drop_rate,
            drop_path=dpr, last_stage=last_stage, use_pallas=self.use_pallas,
            dtype=self.dtype,
        )

    # the final CARAFE's upsample factor (ref CARAFE4, :440-486); the flat
    # head emits logits in its pre-pixel-shuffle layout
    FLAT_HEAD_FACTOR = 4

    @property
    def supports_flat_logits(self) -> bool:
        """The train/eval steps may request ``flat_logits=True``: logits in
        the pre-pixel-shuffle layout (B, img/4, img/4, 16*num_classes), lane
        slot ``s*num_classes + c``.  Loss and dice/IoU are permutation-
        invariant global means, so the step unshuffles the targets (tiny)
        instead of unscrambling full-resolution logits (saves the full-res
        transpose + its layout copies every step on the Pallas path)."""
        return True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 flat_logits: bool = False) -> jnp.ndarray:
        validate_geometry(self.img_size, self.split_size)
        validate_heads(self.embed_dim, self.num_heads)
        # trade FLOPs for HBM: recompute block activations in backward
        if self.remat == "dots":
            Block = nn.remat(CSWinBlock, static_argnums=(2,),
                             policy=jax.checkpoint_policies.dots_saveable)
        elif self.remat:
            Block = nn.remat(CSWinBlock, static_argnums=(2,))
        else:
            Block = CSWinBlock
        deterministic = not train
        E = self.embed_dim
        depth = list(self.depth)
        # stochastic-depth decay schedule, shared by encoder stage i and its
        # decoder twin (ref :514 and :557-599 reuse identical dpr indices)
        total = int(np.sum(depth))
        dpr = [float(r) for r in np.linspace(0.0, self.drop_path_rate, total)]
        starts = np.concatenate([[0], np.cumsum(depth)]).astype(int)
        resos = [self.img_size // (4 * 2 ** i) for i in range(4)]

        # ---- patch embed: conv 7x7 / s4 / p2 + LN (ref :504-508) ----
        img = nn.Conv(E, (7, 7), strides=(4, 4), padding=((2, 2), (2, 2)),
                      dtype=self.dtype, name="embed_conv")(x)
        if self.use_simam:
            img = simam(img)
        tokens = nhwc_to_tokens(img)
        tokens = FusedLayerNorm(dtype=self.dtype,
                                name="embed_norm")(tokens)
        from cswin_simam_unet_tpu.models.layers import FastDropout
        tokens = FastDropout(self.drop_rate)(tokens, deterministic)

        # ---- encoder (ref :625-650); skips returned, not stored ----
        from cswin_simam_unet_tpu.models.layers import scan_blocks

        min_scan_depth = scan_min_depth(self.scan_stages)

        def run_stage(tokens, s: int, name: str, last: bool):
            if min_scan_depth is not None and depth[s] >= min_scan_depth:
                dpr_s = jnp.asarray(dpr[starts[s]:starts[s] + depth[s]],
                                    jnp.float32)
                tokens, _ = scan_blocks(
                    depth[s], self._block_kw(s, resos[s], 0.0, last),
                    deterministic, self.remat, f"{name}_scan",
                    unroll=self.scan_unroll)(tokens, dpr_s)
                return tokens
            for i in range(depth[s]):
                tokens = Block(
                    name=f"{name}_{i}",
                    **self._block_kw(s, resos[s], dpr[starts[s] + i], last),
                )(tokens, deterministic)
            return tokens

        skips = []
        for s in range(4):
            last = s == 3
            tokens = run_stage(tokens, s, f"stage{s + 1}", last)
            if not last:
                skips.append(tokens)
                tokens = MergeBlock(E * 2 ** (s + 1), use_simam=self.use_simam,
                                    use_pallas=self.use_pallas,
                                    dtype=self.dtype, name=f"merge{s + 1}")(
                    tokens, resos[s], resos[s])
        tokens = FusedLayerNorm(dtype=self.dtype,
                                name="norm")(tokens)

        # ---- decoder (ref :653-672) ----
        tokens = run_stage(tokens, 3, "stage_up4", True)
        for s in (2, 1, 0):
            dim = E * 2 ** s
            tokens = CARAFE(dim, up_factor=2, use_simam=self.use_simam,
                            use_pallas=self.use_pallas,
                            dtype=self.dtype, name=f"upsample{s + 2}")(
                tokens, resos[s + 1], resos[s + 1])
            tokens = jnp.concatenate([skips[s], tokens], axis=-1)  # skip first (ref :657)
            tokens = nn.Dense(dim, kernel_init=dense_init, dtype=self.dtype,
                              name=f"concat_linear{s + 2}")(tokens)
            tokens = run_stage(tokens, s, f"stage_up{s + 1}", False)
        tokens = FusedLayerNorm(dtype=self.dtype,
                                name="norm_up")(tokens)

        # ---- final 4x CARAFE + 1x1 bias-free head (ref :674-682) ----
        if self.use_pallas:
            # flat-head fast path: CARAFE output stays in pre-pixel-shuffle
            # layout (B, r0, r0, S^2*E), lane slot s*E + c.  The head's 1x1
            # conv is applied as a block-diagonal dot kron(I_{S^2}, W) in
            # that layout — same (1,1,E,classes) param, no (..., E)-minor
            # reshape (which forced XLA into full-res layout copies) — and
            # only the tiny logits tensor is unscrambled at the very end.
            y, enc, head_bias = CARAFE(E, up_factor=4,
                                       use_simam=self.use_simam,
                                       use_pallas=True, head_precursor=True,
                                       dtype=self.dtype, name="upsample1")(
                tokens, resos[0], resos[0])
            B = y.shape[0]
            r0, S = resos[0], 4
            from cswin_simam_unet_tpu.models.layers import CARAFEHead
            logits = CARAFEHead(self.num_classes, up_factor=S,
                                use_simam=self.use_simam,
                                dtype=self.dtype, name="output")(
                y, enc, head_bias)
            # (B, r0, r0, S^2*classes), lane s*classes + c
            if flat_logits:
                return logits
            return pixel_shuffle(logits, S)
        tokens = CARAFE(E, up_factor=4, use_simam=self.use_simam,
                        use_pallas=self.use_pallas,
                        dtype=self.dtype, name="upsample1")(
            tokens, resos[0], resos[0])
        img = tokens_to_nhwc(tokens, self.img_size, self.img_size)
        from cswin_simam_unet_tpu.models.layers import PointwiseConv
        logits = PointwiseConv(self.num_classes, use_bias=False,
                               dtype=self.dtype, name="output")(img)
        if flat_logits:
            # match the Pallas flat head's layout (for path-equivalence
            # tests and CPU runs of the flat training step)
            from cswin_simam_unet_tpu.ops.windows import pixel_unshuffle
            return pixel_unshuffle(logits, self.FLAT_HEAD_FACTOR)
        return logits

    def predict(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        """Reference-compatible probabilities (ref applies sigmoid at :688)."""
        logits = self.apply(variables, x, train=False)
        if self.num_classes == 1:
            return nn.sigmoid(logits)
        return nn.softmax(logits, axis=-1)
