"""Micro-benchmark for the Pallas CARAFE kernels at the flagship geometry.

Times fwd and fwd+bwd of carafe_flat_pallas at the final-4x-CARAFE shape
(the hottest single op of the 512^2 train step), sweeping the row-tile TH,
so kernel tuning iterates here instead of through whole-step benches.
"""

import argparse
import functools
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
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--th", type=int, nargs="*", default=[2, 4, 8, 16])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()  # shared repo-local cache (survives resets)

    import cswin_simam_unet_tpu.ops.pallas_carafe as pc

    B, H, W, C, S = args.batch, args.hw, args.hw, args.c, args.s
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    enc = jnp.asarray(rs.randn(B, H, W, 9 * S * S).astype(np.float32),
                      jnp.bfloat16)

    def timeit(fn, *a):
        r = fn(*a)  # compile + warm
        # hard sync via value fetch (block_until_ready lies over the tunnel)
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
        return ((t2 - t1) - (t1 - t0)) / (n2 - n1)

    def loss(x_, enc_):
        return jnp.sum(pc.carafe_flat_pallas(x_, enc_, S, 3)
                       .astype(jnp.float32) ** 2)

    # scalar outputs: fetching a big array through the tunnel costs far more
    # than the kernel — time chains that end in one tiny value fetch
    fwd = jax.jit(loss)

    def gsum(x_, enc_):
        dx, denc = jax.grad(loss, argnums=(0, 1))(x_, enc_)
        return (jnp.sum(dx.astype(jnp.float32))
                + jnp.sum(denc.astype(jnp.float32)))

    both = jax.jit(gsum)

    orig = pc._row_tile
    for th in args.th:
        pc._row_tile = lambda *a, **k: th
        if H % th:
            continue
        try:
            t_f = timeit(fwd, x, enc)
            t_b = timeit(both, x, enc)
            print(f"TH={th:3d}: fwd {t_f * 1e3:7.3f} ms, "
                  f"fwd+bwd {t_b * 1e3:7.3f} ms")
        except Exception as e:
            print(f"TH={th:3d}: FAILED {type(e).__name__}: {e}")
        finally:
            fwd.clear_cache()
            both.clear_cache()
    pc._row_tile = orig


if __name__ == "__main__":
    main()
