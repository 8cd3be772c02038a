"""Serving export: frozen StableHLO inference artifacts via ``jax.export``.

The reference has NO deployment story: its one artifact is
``torch.save(model.state_dict())`` (train_unet_segmentation.py:537,
train_cswinunet_segmentation.py:992) and every consumer must re-import the
training code to run inference.  Here the serving path is exported as a
self-contained StableHLO module — weights baked in as constants, the full
uint8 -> normalise -> forward -> probabilities pipeline inside — that a
fresh process (or a C++ PJRT runtime) can execute without any model code:

    blob = export_serving(model, variables, batch_size=8, image_size=512)
    save_serving("model.stablehlo", blob)
    # ... later, anywhere:
    serve = load_serving("model.stablehlo")
    probs = serve(uint8_images_nhwc)        # (B,H,W,C) probabilities

The artifact is platform-checked by jax.export at call time (an artifact
exported on TPU runs on TPU; pass ``platforms`` to cross-lower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_serving_fn(model, variables):
    """The deployment computation: uint8 NHWC batch -> probabilities."""

    def serve(images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        return model.predict(variables, x)

    return serve


def export_serving(model, variables, batch_size: int | None, image_size: int,
                   in_channels: int = 3,
                   platforms: tuple[str, ...] | None = None) -> bytes:
    """Export the serving fn; returns the serialized bytes (weights
    included as module constants).

    ``batch_size=None`` exports with a SYMBOLIC batch dimension — one
    artifact serves any batch size (jax.export shape polymorphism).  Only
    the XLA compute path is batch-polymorphic; models built with
    ``use_pallas=True`` have batch-dependent Pallas grids and must export
    at fixed batch sizes (the XLA path computes identical values).
    """
    from jax import export as jax_export

    serve = make_serving_fn(model, variables)
    if batch_size is None:
        if getattr(model, "use_pallas", False):
            raise ValueError(
                "batch-polymorphic export requires the XLA path: rebuild "
                "the model with use_pallas=False (identical values), or "
                "export fixed batch sizes")
        (b,) = jax_export.symbolic_shape("b")
        batch_dim = b
    else:
        batch_dim = batch_size
    spec = jax.ShapeDtypeStruct(
        (batch_dim, image_size, image_size, in_channels), jnp.uint8)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    exported = jax_export.export(jax.jit(serve), **kwargs)(spec)
    return exported.serialize()


def save_serving(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_serving(path: str):
    """Rehydrate an exported artifact; returns ``serve(images_u8)``.

    Needs only jax — no model classes, no weights files, no package
    imports beyond this function.
    """
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def serve(images_u8):
        images_u8 = _coerce_uint8(images_u8)
        return exported.call(images_u8)

    return serve


def _coerce_uint8(images):
    """Match the artifact's uint8 input spec without silently destroying
    float inputs: the in-process ``model.predict`` accepts normalised floats
    in [0, 1], so a caller handing those here would previously get an
    all-0/1 cast and garbage probabilities.  Floats in [0, 1] are rescaled
    to the 0-255 range the artifact expects; other float ranges must be
    integer-valued (0-255 pixel values stored as float) or are rejected."""
    if isinstance(images, jax.Array):
        if images.dtype == jnp.uint8:
            return images
        if jnp.issubdtype(images.dtype, jnp.floating):
            if images.size == 0:
                return images.astype(jnp.uint8)
            # device syncs — slow path for mistaken dtypes only
            mn = float(jnp.min(images))
            mx = float(jnp.max(images))
            if 0.0 <= mn and mx <= 1.0:
                return jnp.round(images * 255.0).astype(jnp.uint8)
            if 0.0 <= mn and mx <= 255.0 and \
                    bool(jnp.all(images == jnp.round(images))):
                return images.astype(jnp.uint8)
            raise ValueError(
                "load_serving: float input is neither normalised [0,1] nor "
                f"integer-valued 0-255 pixels (range [{mn:g}, {mx:g}]); "
                "pass uint8")
        return images.astype(jnp.uint8)
    arr = np.asarray(images)
    if arr.dtype == np.uint8:
        return arr
    if np.issubdtype(arr.dtype, np.floating):
        if arr.size == 0:
            return arr.astype(np.uint8)
        mn, mx = float(arr.min()), float(arr.max())
        if 0.0 <= mn and mx <= 1.0:
            return np.round(arr * 255.0).astype(np.uint8)
        if 0.0 <= mn and mx <= 255.0 and np.array_equal(arr, np.round(arr)):
            return arr.astype(np.uint8)
        raise ValueError(
            "load_serving: float input is neither normalised [0,1] nor "
            f"integer-valued 0-255 pixels (range [{mn:g}, {mx:g}]); "
            "pass uint8")
    return arr.astype(np.uint8)
