"""Micro-benchmark for the v2 stripe-attention kernels.

Times one branch (fwd and fwd+bwd) at the flagship 512^2 stage geometries,
sweeping the per-tile token targets so kernel tuning iterates here instead
of through whole-step benches.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--stage", type=int, default=1, choices=[1, 2, 3, 4],
                   help="512^2 flagship stage geometry")
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--fwd-tokens", type=int, nargs="*", default=[2048])
    p.add_argument("--bwd-tokens", type=int, nargs="*", default=[1024])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()  # shared repo-local cache (survives resets)

    import cswin_simam_unet_tpu.ops.pallas_attention_v2 as pa2

    # (reso, split, dim, heads) per 512^2 flagship stage; one branch gets
    # dim/2 channels and heads/2 heads (stages 1-3)
    stage_cfg = {1: (128, 1, 64, 2), 2: (64, 2, 128, 4),
                 3: (32, 8, 256, 8), 4: (16, 16, 512, 16)}
    reso, split, dim, heads = stage_cfg[args.stage]
    last = args.stage == 4
    Cb = dim if last else dim // 2
    hb = heads if last else heads // 2
    hsp, wsp = (reso, reso) if last else (split, reso)

    B = args.batch
    rs = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rs.randn(B, reso * reso, Cb), jnp.bfloat16)
               for _ in range(3))
    kernel = jnp.asarray(rs.randn(3, 3, 1, Cb) * 0.1, jnp.float32)
    kw = dict(H=reso, W=reso, hsp=hsp, wsp=wsp, num_heads=hb)

    def run(fn, *a):
        """Slope timing between tiny-scalar fetches: one value fetch through
        the tunnel costs far more than the kernel, so time two chained runs
        and difference them (same method as micro_carafe/bench)."""
        r = fn(*a)  # compile + warm
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        n1, n2 = max(2, args.iters // 5), args.iters
        t0 = time.perf_counter()
        for _ in range(n1):
            r = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        t1 = time.perf_counter()
        for _ in range(n2):
            r = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1) * 1e3  # ms

    def loss(q, k, v):
        return jnp.sum(
            pa2.stripe_attention_pallas_v2(q, k, v, kernel, **kw)
            .astype(jnp.float32))

    fwd = jax.jit(loss)

    def gsum(q, k, v):
        dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return (jnp.sum(dq.astype(jnp.float32))
                + jnp.sum(dk.astype(jnp.float32))
                + jnp.sum(dv.astype(jnp.float32)))

    both = jax.jit(gsum)

    for ft in args.fwd_tokens:
        for bt in args.bwd_tokens:
            pa2._FWD_TOKENS, pa2._BWD_TOKENS = ft, bt
            fwd_t = run(fwd, q, k, v)
            tot_t = run(both, q, k, v)
            print(f"stage{args.stage} fwd_tok={ft:6d} bwd_tok={bt:6d}: "
                  f"fwd {fwd_t:7.3f} ms, fwd+bwd {tot_t:7.3f} ms",
                  flush=True)
            fwd.clear_cache()
            both.clear_cache()


if __name__ == "__main__":
    main()
