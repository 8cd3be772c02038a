"""Loader-only benchmark: can the input pipeline sustain the TPU step rate?

The 512^2 flagship train step runs ~155 img/s/chip (BASELINE.md); the
end-to-end CLI epochs on this 1-core dev host run 25-45 img/s.  This
harness isolates the input pipeline (no TPU, no jit) and measures what the
host side actually delivers, per configuration:

  * ``native``    — C++ batch loader (libjpeg decode + cv2-convention
                    bilinear resize, thread pool) — native/dataio.cpp
  * ``cv2``       — per-sample Python path (cv2 released-GIL decode in a
                    thread pool) — the reference's DataLoader analogue
                    (train_unet_segmentation.py:464-478 uses 4 worker
                    processes doing the same cv2 work)
  * ``cached``    — epoch-2+ RAM-cached decoded samples (--cache-decoded)

Each row reports img/s and img/s normalised per CPU core, so the
production-host claim (N cores x per-core rate >= step rate) is measured,
not extrapolated.
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, size: int, quality: int = 90,
                 content: str = "smooth"):
    import cv2
    img_dir = os.path.join(root, "images")
    mask_dir = os.path.join(root, "masks")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    rs = np.random.RandomState(0)
    for i in range(n):
        img = rs.randint(0, 256, (size, size, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:size, 0:size]
        if content == "smooth":
            # jpeg-compressible content (pure noise inflates decode cost vs
            # real photos): smooth gradients + noise
            img = (img // 4 + ((yy + xx * (i + 1)) % 256)[..., None] // 2) \
                .astype(np.uint8)
        # content == "noise": keep pure noise (decode worst case)
        mask = ((yy // 32 + xx // 32 + i) % 2 * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(img_dir, f"{i:05d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        cv2.imwrite(os.path.join(mask_dir, f"{i:05d}.jpg"), mask)
    return img_dir, mask_dir


def run_epochs(loader, epochs: int):
    t0 = time.perf_counter()
    n = 0
    for _ in range(epochs):
        for images, masks in loader:
            n += images.shape[0]
    return n / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--workers", type=int, default=os.cpu_count() or 1)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--keep", action="store_true")
    p.add_argument("--quality", type=int, default=90)
    p.add_argument("--content", default="smooth",
                   choices=["smooth", "noise"],
                   help="'noise' = pure-noise jpegs (decode worst case)")
    args = p.parse_args()

    from cswin_simam_unet_tpu.data.dataset import SegmentationDataSource
    from cswin_simam_unet_tpu.data.pipeline import DataLoader
    from cswin_simam_unet_tpu.data import native_loader

    cores = os.cpu_count() or 1
    root = tempfile.mkdtemp(prefix="bench_loader_",
                            dir="/dev/shm" if os.path.isdir("/dev/shm")
                            else None)
    try:
        t0 = time.perf_counter()
        img_dir, mask_dir = make_dataset(root, args.n, args.image_size,
                                         args.quality, args.content)
        print(f"dataset: {args.n} jpegs {args.image_size}^2 in "
              f"{time.perf_counter() - t0:.1f}s at {root} "
              f"({cores} cores, native={native_loader.available()})",
              file=sys.stderr)
        source = SegmentationDataSource(img_dir, mask_dir,
                                       (args.image_size, args.image_size))

        results = {}
        configs = [
            ("native", dict(use_native=True)),
            ("cv2", dict(use_native=False)),
            ("cached", dict(use_native=True, cache_decoded=True)),
        ]
        for name, kw in configs:
            if name == "native" and not native_loader.available():
                continue
            loader = DataLoader(source, batch_size=args.batch_size,
                                num_workers=args.workers, **kw)
            if name == "cached":
                run_epochs(loader, 1)  # warm the cache; measure epoch 2+
            ips = run_epochs(loader, args.epochs)
            results[name] = {"img_per_sec": round(ips, 1),
                             "img_per_sec_per_core": round(ips / cores, 1)}
            print(f"{name:>7}: {ips:8.1f} img/s  "
                  f"({ips / cores:.1f} img/s/core)", file=sys.stderr)
        print(json.dumps({"image_size": args.image_size,
                          "batch_size": args.batch_size,
                          "workers": args.workers, "cores": cores,
                          "results": results}))
    finally:
        if not args.keep:
            shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
