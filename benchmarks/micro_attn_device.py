"""Device-side (xplane) A/B of stripe attention: Pallas v2 kernel vs XLA
oracle, per flagship stage geometry.

Wall-clock micro-timing through the axon tunnel is too noisy to compare
kernels (host dispatch jitter dwarfs sub-ms deltas); this instead traces a
few executions and sums exclusive TPU op time from the xplane proto, the
same methodology as benchmarks/profile_step.py.  Usage:

    python benchmarks/micro_attn_device.py [--stages 1 2 3 4] [--batch 8]
        [--attn-drop 0.3] [--steps 5]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# 512^2 flagship stage geometry: (reso, branch_dim, branch_heads, hsp, wsp)
# stage s: reso 128/2^(s-1); split (1, 2, 8, 8); dims (64,128,256,512)/2;
# heads (2,4,8,16)/2.  Vertical-stripe branch shown; the horizontal branch
# is the same cost by symmetry (the kernel transposes).
STAGES = {
    1: (128, 32, 1, 128, 1),
    2: (64, 64, 2, 64, 2),
    3: (32, 128, 4, 32, 8),
    4: (16, 256, 8, 16, 16),
}


def device_ms(fn, args, steps):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix="xab_")
    with jax.profiler.trace(logdir):
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
    path = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                     recursive=True)[0]
    from jax.profiler import ProfileData
    total = 0
    for plane in ProfileData.from_file(path).planes:
        if "/device:TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                head = ev.name.split(" = ")[0]
                if "-start" in head or "-done" in head:
                    continue
                total += ev.duration_ns
    return total / steps / 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", type=int, nargs="*", default=[1, 2, 3, 4])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--attn-drop", type=float, default=0.3)
    p.add_argument("--steps", type=int, default=5)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()  # shared repo-local cache (survives resets)

    from cswin_simam_unet_tpu.ops.attention import stripe_attention
    from cswin_simam_unet_tpu.ops.pallas_attention_v2 import (
        stripe_attention_pallas_v2)

    rs = np.random.RandomState(0)
    rng = jax.random.key(7, impl="rbg")
    for s in args.stages:
        reso, Cb, heads, hsp, wsp = STAGES[s]
        B, L = args.batch, reso * reso
        q, k, v = (jnp.asarray(rs.randn(B, L, Cb), jnp.bfloat16)
                   for _ in range(3))
        w = jnp.asarray(rs.randn(3, 3, 1, Cb), jnp.float32)

        for label, impl in (("xla", stripe_attention),
                            ("pallas", stripe_attention_pallas_v2)):
            def fwd_bwd(q, k, v, w, impl=impl):
                def loss(q, k, v, w):
                    o = impl(q, k, v, w, H=reso, W=reso, hsp=hsp, wsp=wsp,
                             num_heads=heads, attn_drop=args.attn_drop,
                             deterministic=args.attn_drop == 0.0,
                             dropout_rng=rng)
                    return jnp.sum(o.astype(jnp.float32) ** 2)
                g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, w)
                return g
            ms = device_ms(jax.jit(fwd_bwd), (q, k, v, w), args.steps)
            print(f"stage{s} ({reso}^2, Cb={Cb}, h={heads}, "
                  f"{hsp}x{wsp}) {label:6s}: {ms:7.3f} ms fwd+bwd "
                  f"(device-side)")


if __name__ == "__main__":
    main()
