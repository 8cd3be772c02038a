"""End-to-end integration (SURVEY.md §4.5): synthetic jpg dataset -> CLI
training -> loss decreases, artifacts produced, resume works."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    img_dir.mkdir()
    mask_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(10):
        img = (rs.rand(64, 64, 3) * 255).astype(np.uint8)
        cv2.circle(img, (rs.randint(16, 48), rs.randint(16, 48)), 12,
                   (255, 255, 255), -1)
        mask = (img.mean(-1) > 160).astype(np.uint8) * 255
        cv2.imwrite(str(img_dir / f"im_{i:02d}.jpg"), img)
        cv2.imwrite(str(mask_dir / f"im_{i:02d}.jpg"), mask)
    return str(img_dir), str(mask_dir), str(tmp_path / "out")


def _run_cli(*args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "cswin_simam_unet_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=900)


def test_cli_train_and_resume(dataset):
    img_dir, mask_dir, out_dir = dataset
    r = _run_cli("train", "--config", "unet_256", "--image-dir", img_dir,
                 "--mask-dir", mask_dir, "--output-dir", out_dir,
                 "--image-size", "32", "--epochs", "2")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Epoch [2/2]" in r.stdout
    csv = os.path.join(out_dir, "unet_256_training_metrics.csv")
    png = os.path.join(out_dir, "unet_256_training_metrics.png")
    assert os.path.exists(csv) and os.path.exists(png)
    lines = open(csv).read().strip().splitlines()
    assert len(lines) == 3  # header + 2 epochs
    assert lines[0].startswith("Epoch,Train_Loss,Train_Dice,Train_IoU,"
                               "Test_Loss,Test_Dice,Test_IoU,Learning_Rate")

    # resume one more epoch from the checkpoint
    r2 = _run_cli("train", "--config", "unet_256", "--image-dir", img_dir,
                  "--mask-dir", mask_dir, "--output-dir", out_dir,
                  "--image-size", "32", "--epochs", "3", "--resume")
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert "Resumed from epoch 2" in r2.stdout
    assert "Epoch [3/3]" in r2.stdout

    # predict: segment the same images with the final-weights artifact
    import cv2
    pred_dir = os.path.join(out_dir, "preds")
    weights = os.path.join(out_dir, "unet_256_final_weights.msgpack")
    r3 = _run_cli("predict", "--config", "unet_256", "--weights", weights,
                  "--image-dir", img_dir, "--output-dir", pred_dir,
                  "--image-size", "32", "--batch-size", "4")
    assert r3.returncode == 0, r3.stderr[-2000:]
    assert "Wrote 10 masks" in r3.stdout
    masks = sorted(os.listdir(pred_dir))
    assert len(masks) == 10 and masks[0] == "im_00_mask.png"
    m = cv2.imread(os.path.join(pred_dir, masks[0]), cv2.IMREAD_GRAYSCALE)
    assert m is not None and m.shape == (32, 32)
    assert set(np.unique(m)) <= {0, 255}

    # evaluate: re-score the final weights on the held-out split; the last
    # CSV row's test metrics must reproduce exactly (same eval semantics)
    r4 = _run_cli("evaluate", "--config", "unet_256", "--weights", weights,
                  "--image-dir", img_dir, "--mask-dir", mask_dir,
                  "--image-size", "32", "--split", "test")
    assert r4.returncode == 0, r4.stderr[-2000:]
    last = open(csv).read().strip().splitlines()[-1].split(",")
    test_loss, test_dice = float(last[4]), float(last[5])
    import re
    got = re.search(r"Loss: ([\d.]+), Dice: ([\d.]+)", r4.stdout)
    assert got, r4.stdout
    assert abs(float(got.group(1)) - test_loss) < 1e-4
    assert abs(float(got.group(2)) - test_dice) < 1e-4

    # the checkpoint-DIRECTORY weights path (latest epoch == final weights
    # here) must score identically to the msgpack artifact
    ckpt_dir = os.path.join(out_dir, "unet_256_checkpoints")
    r5 = _run_cli("evaluate", "--config", "unet_256", "--weights", ckpt_dir,
                  "--image-dir", img_dir, "--mask-dir", mask_dir,
                  "--image-size", "32", "--split", "test")
    assert r5.returncode == 0, r5.stderr[-2000:]
    got5 = re.search(r"Loss: ([\d.]+), Dice: ([\d.]+)", r5.stdout)
    assert got5 and abs(float(got5.group(1)) - test_loss) < 1e-4, r5.stdout
