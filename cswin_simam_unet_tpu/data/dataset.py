"""Paired image/mask file source with reference-identical semantics.

Parity target: ``SegmentationDataset`` (train_unet_segmentation.py:88-172):
sorted ``*.jpg`` glob of the image dir; mask looked up by identical basename
in the mask dir; missing/unreadable mask -> zero mask + warning; byte-level
read + imdecode (Unicode-path safe); BGR->RGB; bilinear resize of both image
AND mask to the target size (masks become soft at edges — deliberately kept);
raises if the image dir has no jpgs.

Host work stops at "decoded + resized uint8"; normalisation and augmentation
run on device (:mod:`cswin_simam_unet_tpu.data.augment`).  The decode backend
prefers the native C++ loader when built, then cv2, then PIL.
"""

from __future__ import annotations

import os
import warnings
from glob import glob
from typing import Optional, Sequence, Tuple

import numpy as np


def _decode_resize_cv2(data: bytes, size: Tuple[int, int], gray: bool,
                       nearest: bool = False):
    import cv2
    arr = np.frombuffer(data, dtype=np.uint8)
    flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
    img = cv2.imdecode(arr, flag)
    if img is None:
        return None
    if not gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    # cv2.resize takes (width, height); size is (height, width) like the
    # reference's IMAGE_SIZE constant usage (ref :157-158 passes image_size
    # directly, i.e. (w, h) order for square sizes — identical for squares).
    interp = cv2.INTER_NEAREST if nearest else cv2.INTER_LINEAR
    return cv2.resize(img, (size[1], size[0]), interpolation=interp)


def _decode_resize_pil(data: bytes, size: Tuple[int, int], gray: bool,
                       nearest: bool = False):
    import io
    from PIL import Image
    img = Image.open(io.BytesIO(data))
    img = img.convert("L" if gray else "RGB")
    img = img.resize((size[1], size[0]),
                     Image.NEAREST if nearest else Image.BILINEAR)
    return np.asarray(img)


def decode_resize(data: bytes, size: Tuple[int, int],
                  gray: bool = False,
                  nearest: bool = False) -> Optional[np.ndarray]:
    """Decode an encoded image and resize to (H, W). Returns uint8 HWC (RGB)
    or HW (grayscale), or None if undecodable.  ``nearest`` selects
    nearest-neighbour resampling (categorical masks); the native loader is
    bilinear-only, so nearest requests go straight to cv2/PIL."""
    if not nearest:
        try:
            from cswin_simam_unet_tpu.data import native_loader
            if native_loader.available():
                out = native_loader.decode_resize(data, size, gray)
                if out is not None:
                    return out
        except ImportError:
            pass
    try:
        return _decode_resize_cv2(data, size, gray, nearest)
    except ImportError:
        return _decode_resize_pil(data, size, gray, nearest)


class SegmentationDataSource:
    """Indexable source of (image uint8 HWC, mask uint8 HW1) pairs."""

    IMAGE_EXTS = ("*.jpg",)  # reference globs only *.jpg (ref :116)

    def __init__(self, image_dir: str, mask_dir: str,
                 image_size: Tuple[int, int] = (448, 448),
                 extensions: Sequence[str] = IMAGE_EXTS,
                 mask_nearest: bool = False):
        self.image_dir = image_dir
        self.mask_dir = mask_dir
        self.image_size = tuple(image_size)
        # nearest-neighbour mask resize: required for multiclass class-id
        # masks; binary masks keep the reference's soft bilinear resize
        self.mask_nearest = mask_nearest
        paths = []
        for ext in extensions:
            paths.extend(glob(os.path.join(image_dir, ext)))
        self.image_paths = sorted(paths)
        if not self.image_paths:
            raise ValueError(f"no images found in directory: {image_dir}")

    def __len__(self) -> int:
        return len(self.image_paths)

    def mask_path(self, idx: int) -> Optional[str]:
        name = os.path.basename(self.image_paths[idx])
        path = os.path.join(self.mask_dir, name)
        return path if os.path.exists(path) else None

    def load_batch(self, indices) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Native threaded batch load (C++ decode+resize straight into the
        batch buffer); None if the native library is unavailable or any
        image fails to decode natively (caller falls back per-sample)."""
        from cswin_simam_unet_tpu.data import native_loader
        if not native_loader.available() or self.mask_nearest:
            return None  # native resize is bilinear-only
        img_paths = [self.image_paths[i] for i in indices]
        mask_paths = [self.mask_path(i) for i in indices]
        out = native_loader.load_batch(img_paths, mask_paths,
                                       self.image_size)
        if out is None:
            return None
        images, masks, status = out
        if np.any(status == 1):  # undecodable image -> per-sample fallback
            return None
        bad_mask = status == 2
        if np.any(bad_mask):
            # A mask file that EXISTS but libjpeg can't decode (e.g. PNG
            # bytes in a .jpg name) deserves the cv2/PIL fallback — the
            # reference's cv2.imdecode would read it.  Only a genuinely
            # missing mask becomes the zero mask.
            if any(bad_mask[i] and mask_paths[i] is not None
                   for i in range(len(indices))):
                return None
            for i in np.nonzero(bad_mask)[0]:
                warnings.warn(f"no mask for "
                              f"{os.path.basename(img_paths[i])}; "
                              f"using empty mask")
        return images, masks

    def load(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        img_path = self.image_paths[idx]
        with open(img_path, "rb") as f:
            image = decode_resize(f.read(), self.image_size, gray=False)
        if image is None:
            raise ValueError(f"cannot decode image: {img_path}")

        name = os.path.basename(img_path)
        mask_path = os.path.join(self.mask_dir, name)
        mask = None
        if os.path.exists(mask_path):
            with open(mask_path, "rb") as f:
                mask = decode_resize(f.read(), self.image_size, gray=True,
                                     nearest=self.mask_nearest)
            if mask is None:
                warnings.warn(f"cannot decode mask for {name}; using empty mask")
        else:
            warnings.warn(f"no mask found for {name}; using empty mask")
        if mask is None:
            mask = np.zeros(self.image_size, dtype=np.uint8)
        return image, mask[..., None]


def train_test_indices(n: int, test_split: float = 0.2,
                       seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """Index split identical to the reference's sklearn
    ``train_test_split(range(n), test_size, random_state)``
    (train_unet_segmentation.py:449-453)."""
    from sklearn.model_selection import train_test_split
    train_idx, test_idx = train_test_split(
        np.arange(n), test_size=test_split, random_state=seed)
    return np.asarray(train_idx), np.asarray(test_idx)
