"""Op-level profile of the flagship train step (xplane-based).

Captures a jax.profiler trace of a few benchmark train steps and aggregates
TPU-side op durations from the xplane proto (via jax.profiler.ProfileData),
printing the top ops grouped by a coarse category so optimisation targets the
true bottleneck.  Usage:

    python benchmarks/profile_step.py [--batch 8] [--image-size 512]
        [--attn-drop 0.0] [--model cswin] [--steps 3]
"""

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def categorize(name: str) -> str:
    n = name.lower()
    if "pallas" in n or "attn" in n or "branch_attention" in n:
        return "pallas-attention"
    if "carafe" in n or "upsample" in n:
        return "pallas-carafe"
    if "fusion" in n:
        return "fusion"
    if "conv" in n:
        return "conv"
    if "dot" in n or "matmul" in n:
        return "matmul"
    if "copy" in n or "transpose" in n or "reshape" in n or "bitcast" in n:
        return "layout"
    if "reduce" in n:
        return "reduce"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--attn-drop", type=float, default=0.0)
    p.add_argument("--model", default="cswin", choices=["cswin", "unet"])
    p.add_argument("--mode", default="train", choices=["train", "infer"],
                   help="'infer' profiles the serving path (frozen weights, "
                        "uint8 -> normalise -> forward -> probabilities), "
                        "matching bench.py --mode infer")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--augment", action="store_true",
                   help="include the on-device augmentation in the step")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--raw", action="store_true",
                   help="also print top raw (uncanonicalised) ops with shapes")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()  # shared repo-local cache (survives resets)

    from cswin_simam_unet_tpu.models import CSWinUNet, UNet
    from cswin_simam_unet_tpu.train.engine import (create_train_state,
                                                   make_train_step)

    img = args.image_size
    use_pallas = (not args.no_pallas) and jax.devices()[0].platform == "tpu"
    drop = args.attn_drop
    if args.model == "unet":
        model = UNet(use_simam=True, dtype=jnp.bfloat16)
        opt = "adam"
    else:
        model = CSWinUNet(img_size=img, use_simam=True,
                          split_size=(1, 2, 8, 8), num_classes=1,
                          drop_rate=drop, attn_drop_rate=drop,
                          drop_path_rate=drop, use_pallas=use_pallas,
                          dtype=jnp.bfloat16)
        opt = "adamw"
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, img, img, 3), opt, 1e-4, 1e-4)
    if args.mode == "infer":
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        predict = jax.jit(lambda v, im: model.predict(
            v, im.astype(jnp.float32) / 255.0))

        def step(state, images, masks, rng):
            probs = predict(variables, images)
            return state, {"loss": jnp.mean(probs)}
    else:
        augment = None
        if args.augment:
            from cswin_simam_unet_tpu.data.augment import AugmentConfig
            augment = AugmentConfig()
        step = make_train_step(model, n_classes=1, augment=augment,
                               donate=True)
    rs = np.random.RandomState(0)
    images = jax.device_put(
        rs.randint(0, 256, (args.batch, img, img, 3), dtype=np.uint8))
    masks = jax.device_put(
        rs.randint(0, 2, (args.batch, img, img, 1), dtype=np.uint8) * 255)
    rng = jax.random.key(1, impl='rbg')  # match engine.fit / bench.py hardware-RNG keys

    for _ in range(2):  # compile + warm
        state, metrics = step(state, images, masks, rng)
    _ = float(metrics["loss"])

    logdir = tempfile.mkdtemp(prefix="xprof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.steps):
            state, metrics = step(state, images, masks, rng)
        _ = float(metrics["loss"])

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    from jax.profiler import ProfileData
    data = ProfileData.from_file(paths[0])

    # Aggregate ONLY the device "XLA Ops" line: a flat exclusive timeline of
    # op executions.  Async (-start) events overlap compute — the scheduler
    # hides DMA behind it — so they are tracked separately, not summed into
    # the exclusive total.  Names are canonicalised: "%attn0.78 = ..." and
    # "%attn0.103 = ..." both aggregate under "attn0".
    strip = re.compile(r"^%?([a-zA-Z_][\w\-]*?)(?:[._]\d+)*(?:\s*=.*)?$",
                       re.S)

    def base(name):
        m = strip.match(name)
        return m.group(1) if m else name

    sync = collections.Counter()
    raw = collections.Counter()
    asyn = collections.Counter()
    module_ns = 0
    for plane in data.planes:
        if "/device:TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name == "XLA Modules":
                module_ns += sum(ev.duration_ns for ev in line.events)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                b = base(ev.name)
                if ("-start" in ev.name.split(" = ")[0]
                        or "-done" in ev.name.split(" = ")[0]):
                    asyn[b] += ev.duration_ns
                else:
                    sync[b] += ev.duration_ns
                    raw[ev.name] += ev.duration_ns

    total = sum(sync.values())
    print(f"module wall {module_ns / args.steps / 1e6:.2f} ms/step; "
          f"sync ops {total / args.steps / 1e6:.2f} ms/step; "
          f"async (overlapped) {sum(asyn.values()) / args.steps / 1e6:.2f} "
          f"ms/step")
    by_cat = collections.Counter()
    for name, ns in sync.items():
        by_cat[categorize(name)] += ns
    print("\n-- sync by category (ms/step) --")
    for cat, ns in by_cat.most_common():
        print(f"{ns / args.steps / 1e6:9.3f}  {100 * ns / total:5.1f}%  {cat}")
    print(f"\n-- top {args.top} sync ops (ms/step) --")
    for name, ns in sync.most_common(args.top):
        print(f"{ns / args.steps / 1e6:9.3f}  {100 * ns / total:5.1f}%  "
              f"{name[:100]}")
    print(f"\n-- top 10 async ops (ms/step, overlapped) --")
    for name, ns in asyn.most_common(10):
        print(f"{ns / args.steps / 1e6:9.3f}  {name[:100]}")
    if args.raw:
        print(f"\n-- top {args.top} raw ops (ms/step) --")
        for name, ns in raw.most_common(args.top):
            print(f"{ns / args.steps / 1e6:9.3f}  {100 * ns / total:5.1f}%  "
                  f"{name[:220]}")


if __name__ == "__main__":
    main()
