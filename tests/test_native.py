"""Native C++ data loader tests: decode/resize parity with cv2, threaded
batch loading, mask fallback, graceful PNG fallback."""

import os

import numpy as np
import pytest

from cswin_simam_unet_tpu.data import native_loader
from cswin_simam_unet_tpu.data.dataset import SegmentationDataSource
from cswin_simam_unet_tpu.data.pipeline import DataLoader

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native library not built")


@pytest.fixture
def jpeg_dir(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(5):
        img = (rs.rand(50, 60, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"s{i}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        if i != 2:
            mask = ((rs.rand(50, 60) > 0.5) * 255).astype(np.uint8)
            cv2.imwrite(str(mask_dir / f"s{i}.jpg"), mask)
    return str(img_dir), str(mask_dir)


def test_native_decode_matches_cv2(jpeg_dir):
    import cv2
    img_dir, _ = jpeg_dir
    path = os.path.join(img_dir, "s0.jpg")
    with open(path, "rb") as f:
        data = f.read()
    got = native_loader.decode_resize(data, (32, 48))
    assert got is not None and got.shape == (32, 48, 3)
    arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
    want = cv2.resize(arr, (48, 32), interpolation=cv2.INTER_LINEAR)
    # different IDCT + fixed-point resize implementations: allow small slack
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.mean(diff) < 2.0 and np.percentile(diff, 99) <= 6, (
        diff.mean(), diff.max())


def test_native_gray_decode(jpeg_dir):
    _, mask_dir = jpeg_dir
    with open(os.path.join(mask_dir, "s0.jpg"), "rb") as f:
        data = f.read()
    got = native_loader.decode_resize(data, (25, 30), gray=True)
    assert got is not None and got.shape == (25, 30)


def test_native_rejects_png():
    import cv2
    img = np.zeros((8, 8, 3), np.uint8)
    ok, enc = cv2.imencode(".png", img)
    assert native_loader.decode_resize(enc.tobytes(), (8, 8)) is None


def test_native_batch_with_missing_mask(jpeg_dir):
    img_dir, mask_dir = jpeg_dir
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    with pytest.warns(UserWarning, match="empty mask"):
        out = src.load_batch([0, 1, 2, 3])
    assert out is not None
    images, masks = out
    assert images.shape == (4, 32, 32, 3)
    assert masks.shape == (4, 32, 32, 1)
    assert np.all(masks[2] == 0)  # s2 has no mask

    # native batch must agree with the per-sample (cv2) path
    img_cv, mask_cv = src.load(0)
    diff = np.abs(images[0].astype(int) - img_cv.astype(int))
    assert np.mean(diff) < 2.0


def test_loader_uses_native(jpeg_dir):
    img_dir, mask_dir = jpeg_dir
    src = SegmentationDataSource(img_dir, mask_dir, image_size=(32, 32))
    loader = DataLoader(src, batch_size=5, num_workers=2, use_native=True)
    with pytest.warns(UserWarning):
        (images, masks), = list(loader)
    assert images.shape == (5, 32, 32, 3)
    loader_py = DataLoader(src, batch_size=5, num_workers=2, use_native=False)
    with pytest.warns(UserWarning):
        (images2, _), = list(loader_py)
    assert np.mean(np.abs(images.astype(int) - images2.astype(int))) < 2.0
