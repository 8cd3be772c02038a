"""CARAFE content-aware reassembly upsampling — TPU-native data path.

The reference implements CARAFE with ``pixel_shuffle`` + four nested
``tensor.unfold`` views + a per-pixel matmul
(train_cswinunet_segmentation.py:391-486, duplicated as CARAFE and CARAFE4).
That formulation is layout-hostile on TPU; here the reassembly is re-derived
as a static neighbourhood gather (K*K shifted, zero-padded slices — XLA fuses
these into the consumer) plus one einsum contraction over the K*K taps, with
the sub-pixel axis kept explicit until a final reshape/transpose performs the
pixel shuffle.

Tap and sub-pixel orderings follow the PyTorch conventions (tap index
``k = dy*K + dx``; sub-pixel index ``s = i*S + j``) so imported reference
weights reproduce reference outputs exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_neighborhoods(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """Gather zero-padded KxK neighbourhoods of an NHWC map.

    Returns (B, H, W, K*K, C) where tap ``k = dy*K + dx`` holds the value at
    input position ``(h + dy - K//2, w + dx - K//2)`` (zeros outside) — the
    ordering produced by the reference's pad + double-unfold
    (train_cswinunet_segmentation.py:421-427).
    """
    B, H, W, C = x.shape
    r = ksize // 2
    padded = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    taps = [
        padded[:, dy:dy + H, dx:dx + W, :]
        for dy in range(ksize)
        for dx in range(ksize)
    ]
    return jnp.stack(taps, axis=3)


import functools


@functools.partial(jax.checkpoint, static_argnums=(2, 3))
def carafe_reassemble(x: jnp.ndarray, enc: jnp.ndarray, up_factor: int,
                      ksize: int = 3) -> jnp.ndarray:
    """Content-aware reassembly: upsample ``x`` by ``up_factor`` using
    predicted per-output-pixel kernels.

    ``x``:   (B, H, W, C) features to upsample.
    ``enc``: (B, H, W, S^2 * K^2) raw kernel-prediction logits, channel index
             ``k * S^2 + s`` (k = tap, s = sub-pixel) — the layout the
             reference's encoder conv feeds into ``pixel_shuffle``
             (train_cswinunet_segmentation.py:409-417).

    Returns (B, S*H, S*W, C).

    TPU layout note: the obvious einsum over a (B, H, W, K^2, S^2) kernel
    tensor is poison — XLA pads the two minor dims to (8,128) tiles, a
    measured 14.2x memory expansion that OOMs 512^2 batch-32 training.
    Instead the K^2 tap dimension is kept as *separate full-resolution
    planes* (minor dims = spatial, no padding): pixel-shuffle each tap's
    logits to (B, SH, SW), softmax across the 9 planes elementwise, and
    accumulate 9 broadcast FMAs of the nearest-upsampled shifted inputs.
    Same math, fully fusable, no padded intermediates.
    """
    B, H, W, C = x.shape
    S, K2 = up_factor, ksize * ksize
    S2 = S * S
    r = ksize // 2

    # tap logit slices stay low-res (B, H, W, S^2); softmax across the K^2
    # slices elementwise (transients are small and fuse away)
    logits = [enc[..., k * S2:(k + 1) * S2].astype(jnp.float32)
              for k in range(K2)]
    m = logits[0]
    for t in logits[1:]:
        m = jnp.maximum(m, t)
    exps = [jnp.exp(t - m) for t in logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e

    # accumulate at low resolution into ONE (B, H, W, S^2, C) buffer
    # (s-major channel order = pixel-shuffle order); minor dims (S^2, C) are
    # tile-friendly, and only one output-sized accumulator is ever alive.
    # Accumulation follows the compute dtype: in bf16 mode full-res f32
    # temporaries (1GB each at 512^2 batch 16) would dominate HBM.
    acc_dtype = x.dtype if x.dtype != jnp.float64 else jnp.float32
    padded = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)))
    acc = jnp.zeros((B, H, W, S2, C), acc_dtype)
    k_idx = 0
    for dy in range(ksize):
        for dx in range(ksize):
            xk = padded[:, dy:dy + H, dx:dx + W, :]  # shifted tap (B,H,W,C)
            p_k = (exps[k_idx] / denom).astype(acc_dtype)[..., None]
            acc = acc + p_k * xk[:, :, :, None, :]
            k_idx += 1

    # pixel shuffle: s = i*S + j -> output (h*S + i, w*S + j)
    out = acc.reshape(B, H, W, S, S, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H * S, W * S, C).astype(x.dtype)
