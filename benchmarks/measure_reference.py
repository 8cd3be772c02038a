"""Measure the PyTorch reference's fwd+bwd throughput to instantiate the
baseline denominator (BASELINE.md action item: the reference publishes no
numbers, so we measure it on available hardware and record the result).

Runs the reference CSWinTransformer (import-only, never copied) at 512^2
with split [1,2,8,8] (the default [1,2,7,7] cannot run 512^2 — SURVEY.md §6)
and the reference UNet at 512^2, BCE loss, Adam step included, on CPU or
CUDA if available.  Writes benchmarks/baseline_measured.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(__file__) or ".")

import torch  # noqa: E402

from reference_loader import load_reference  # noqa: E402


def measure(model_fn, batch, iters=3, warmup=1, img=512):
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = model_fn().to(device)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-4)
    crit = torch.nn.BCELoss()
    x = torch.rand(batch, 3, img, img, device=device)
    y = (torch.rand(batch, 1, img, img, device=device) > 0.5).float()
    for _ in range(warmup):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    if device == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(iters):
        opt.zero_grad()
        loss = crit(model(x), y)
        loss.backward()
        opt.step()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    return batch * iters / dt, device


def measure_infer(model_fn, batch, iters=4, warmup=1, img=512):
    """eval-mode no_grad forward (the serving path; the reference has no
    inference entry point, so this is the state_dict-reload usage its
    training scripts imply, ref :537/:992)."""
    device = "cuda" if torch.cuda.is_available() else "cpu"
    model = model_fn().to(device)
    model.eval()
    x = torch.rand(batch, 3, img, img, device=device)
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        if device == "cuda":
            torch.cuda.synchronize()
        t0 = time.perf_counter()
        for _ in range(iters):
            model(x)
        if device == "cuda":
            torch.cuda.synchronize()
    dt = time.perf_counter() - t0
    return batch * iters / dt, device


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--infer-only", action="store_true",
                   help="measure only the eval-mode forward rows, merging "
                        "into an existing baseline_measured.json (keeps the "
                        "previously recorded train denominators intact)")
    args = p.parse_args()

    torch.manual_seed(0)
    results = {"hardware": "cuda" if torch.cuda.is_available() else
               f"cpu ({os.cpu_count()} cores)",
               "image_size": 512, "loss": "BCE", "optimizer_step": True}
    out = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if args.infer_only and os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    device = "cuda" if torch.cuda.is_available() else "cpu"

    cswin_mod = load_reference("cswin")
    unet_mod = load_reference("unet")

    if not args.infer_only:
        ips, device = measure(
            lambda: cswin_mod.CSWinTransformer(
                img_size=512, in_chans=3, num_classes=1, embed_dim=64,
                depth=[1, 2, 9, 1], split_size=[1, 2, 8, 8],
                num_heads=[2, 4, 8, 16], mlp_ratio=4.0, qkv_bias=True,
                drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0),
            batch=1, iters=2)
        results["cswin_512_imgs_per_sec"] = ips
        print(f"reference CSWin-UNet 512^2 fwd+bwd+step: {ips:.4f} img/s "
              f"on {device}", file=sys.stderr)

        ips_u, _ = measure(lambda: unet_mod.UNet(3, 1), batch=1, iters=2)
        results["unet_512_imgs_per_sec"] = ips_u
        print(f"reference UNet 512^2 fwd+bwd+step: {ips_u:.4f} img/s "
              f"on {device}", file=sys.stderr)

    ips_ci, _ = measure_infer(
        lambda: cswin_mod.CSWinTransformer(
            img_size=512, in_chans=3, num_classes=1, embed_dim=64,
            depth=[1, 2, 9, 1], split_size=[1, 2, 8, 8],
            num_heads=[2, 4, 8, 16], mlp_ratio=4.0, qkv_bias=True,
            drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0),
        batch=1)
    results["cswin_512_infer_imgs_per_sec"] = ips_ci
    print(f"reference CSWin-UNet 512^2 infer: {ips_ci:.4f} img/s on {device}",
          file=sys.stderr)

    ips_ui, _ = measure_infer(lambda: unet_mod.UNet(3, 1), batch=1)
    results["unet_512_infer_imgs_per_sec"] = ips_ui
    print(f"reference UNet 512^2 infer: {ips_ui:.4f} img/s on {device}",
          file=sys.stderr)

    out = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
