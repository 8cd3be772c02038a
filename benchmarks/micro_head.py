"""Micro-benchmark for the fused CARAFE/SimAM head at the flagship geometry.

The 512^2 profile attributes ~9.7 ms/step to the four head kernels
(K1 reassembly+moments, K2 gate+dot, K3 reductions, K4 fused backward);
the VPU-FLOP floor is ~2.4 ms (BASELINE.md round-3 decomposition).  This
tool times the pieces in isolation so kernel tuning iterates here.
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
    p.add_argument("--hw", type=int, default=128)
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--s", type=int, default=4)
    p.add_argument("--f", type=int, default=1)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--no-gate", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from cswin_simam_unet_tpu.ops.pallas_carafe_head import (
        _carafe_biased_moments,
        carafe_simam_head,
    )

    B, H, W, C, S, F = args.batch, args.hw, args.hw, args.c, args.s, args.f
    gate = not args.no_gate
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    enc = jnp.asarray(rs.randn(B, H, W, 9 * S * S).astype(np.float32),
                      jnp.bfloat16)
    bias = jnp.asarray(rs.randn(C).astype(np.float32) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rs.randn(C, F).astype(np.float32) * 0.1)
    dy = jnp.asarray(rs.randn(B, H, W, S * S * F).astype(np.float32) * 0.1,
                     jnp.bfloat16)

    def timeit(fn, *a):
        r = fn(*a)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
        n1, n2 = max(2, args.iters // 5), args.iters
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n1):
                r = fn(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
            t1 = time.perf_counter()
            for _ in range(n2):
                r = fn(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
            t2 = time.perf_counter()
            dt = ((t2 - t1) - (t1 - t0)) / (n2 - n1)
            best = dt if best is None else min(best, dt)
        return best

    fwd = jax.jit(lambda *a: carafe_simam_head(*a, S, 3, 1e-4, gate))
    t_fwd = timeit(fwd, x, enc, bias, w)
    print(f"head fwd (K1+K2): {t_fwd * 1e3:.3f} ms")

    k1 = jax.jit(lambda x_, e_, b_: _carafe_biased_moments(
        x_, e_, jnp.tile(b_, S * S), S, gate, False))
    t_k1 = timeit(k1, x, enc, bias)
    print(f"  K1 reassembly+bias+moments: {t_k1 * 1e3:.3f} ms "
          f"(K2 = {max(t_fwd - t_k1, 0) * 1e3:.3f})")

    def loss(x_, e_, b_, w_):
        out = carafe_simam_head(x_, e_, b_, w_, S, 3, 1e-4, gate)
        return jnp.sum(out.astype(jnp.float32) * dy.astype(jnp.float32))

    vg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    t_all = timeit(vg, x, enc, bias, w)
    print(f"head fwd+bwd: {t_all * 1e3:.3f} ms (bwd {max(t_all - t_fwd, 0) * 1e3:.3f})")


if __name__ == "__main__":
    main()
