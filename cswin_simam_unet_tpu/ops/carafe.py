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


def carafe_reassemble(x: jnp.ndarray, enc: jnp.ndarray, up_factor: int,
                      ksize: int = 3) -> jnp.ndarray:
    """Content-aware reassembly: upsample ``x`` by ``up_factor`` using
    predicted per-output-pixel kernels.

    ``x``:   (B, H, W, C) features to upsample.
    ``enc``: (B, H, W, S^2 * K^2) raw kernel-prediction logits, channel index
             ``k * S^2 + s`` (k = tap, s = sub-pixel) — the layout the
             reference's encoder conv feeds into ``pixel_shuffle``
             (train_cswinunet_segmentation.py:409-417).

    Returns (B, S*H, S*W, C).  Softmax normalises the K^2 taps per output
    pixel; the contraction is one einsum the compiler keeps fused with the
    tap gather.
    """
    B, H, W, C = x.shape
    S, K2 = up_factor, ksize * ksize
    kern = enc.reshape(B, H, W, K2, S * S)
    kern = jax.nn.softmax(kern, axis=3)
    patches = extract_neighborhoods(x, ksize)  # (B, H, W, K2, C)
    out = jnp.einsum("bhwkc,bhwks->bhwsc", patches, kern,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    # sub-pixel shuffle: s = i*S + j  ->  output pixel (h*S + i, w*S + j)
    out = out.reshape(B, H, W, S, S, C)
    out = out.transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H * S, W * S, C)
