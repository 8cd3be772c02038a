"""Data layer tests: pairing/globbing semantics, decode, loader batching,
index split parity with sklearn (SURVEY.md §4.5)."""

import os

import numpy as np
import pytest

from cswin_simam_unet_tpu.data.dataset import (
    SegmentationDataSource,
    decode_resize,
    train_test_indices,
)
from cswin_simam_unet_tpu.data.pipeline import DataLoader


@pytest.fixture
def jpeg_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rs = np.random.RandomState(0)
    n = 7
    for i in range(n):
        img = (rs.rand(40, 40, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"sample_{i:02d}.jpg"), img)
        if i != 3:  # sample_03 deliberately has no mask
            mask = ((rs.rand(40, 40) > 0.5) * 255).astype(np.uint8)
            cv2.imwrite(str(mask_dir / f"sample_{i:02d}.jpg"), mask)
    return str(img_dir), str(mask_dir), n


def test_source_globs_sorted_jpgs(jpeg_dataset):
    img_dir, mask_dir, n = jpeg_dataset
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    assert len(src) == n
    names = [os.path.basename(p) for p in src.image_paths]
    assert names == sorted(names)


def test_source_shapes_and_missing_mask(jpeg_dataset):
    img_dir, mask_dir, _ = jpeg_dataset
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    img, mask = src.load(0)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert mask.shape == (32, 32, 1) and mask.dtype == np.uint8
    with pytest.warns(UserWarning, match="no mask"):
        _, m3 = src.load(3)
    assert np.all(m3 == 0)


def test_empty_dir_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no images"):
        SegmentationDataSource(str(tmp_path / "empty"), str(tmp_path))


def test_train_test_split_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import train_test_split
    tr, te = train_test_indices(100, 0.2, 42)
    tr2, te2 = train_test_split(np.arange(100), test_size=0.2,
                                random_state=42)
    np.testing.assert_array_equal(tr, tr2)
    np.testing.assert_array_equal(te, te2)


def test_loader_batching_and_partial_last(jpeg_dataset):
    img_dir, mask_dir, n = jpeg_dataset
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    loader = DataLoader(src, batch_size=4, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 32, 32, 3)
    assert batches[1][0].shape == (3, 32, 32, 3)  # partial last batch kept
    assert batches[0][1].shape == (4, 32, 32, 1)


def test_loader_shuffle_deterministic(jpeg_dataset):
    img_dir, mask_dir, _ = jpeg_dataset
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(16, 16))
    l1 = DataLoader(src, batch_size=7, shuffle=True, seed=1)
    l2 = DataLoader(src, batch_size=7, shuffle=True, seed=1)
    b1 = next(iter(l1))
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b1[0], b2[0])
    # second epoch differs from the first
    b1e2 = next(iter(l1))
    assert not np.array_equal(b1[0], b1e2[0])


def test_loader_cache_decoded_identical_values(jpeg_dataset):
    """cache_decoded=True skips decode on later epochs but must never
    change values — including the zero-mask fallback sample."""
    img_dir, mask_dir, _ = jpeg_dataset
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    plain = DataLoader(src, batch_size=3, shuffle=True, seed=2)
    cached = DataLoader(src, batch_size=3, shuffle=True, seed=2,
                        cache_decoded=True)
    for epoch in range(2):  # epoch 2 is served from the cache
        for (pi, pm), (ci, cm) in zip(plain, cached):
            np.testing.assert_array_equal(pi, ci)
            np.testing.assert_array_equal(pm, cm)
    assert cached._cache and plain._cache is None


def test_decode_resize_roundtrip():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(0)
    img = (rs.rand(20, 30, 3) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".png", img)  # lossless for exact comparison
    assert ok
    out = decode_resize(bytes(enc.tobytes()), (20, 30))
    # BGR->RGB conversion happens inside decode_resize
    np.testing.assert_array_equal(out, img[..., ::-1])
