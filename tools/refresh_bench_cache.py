"""Regenerate the committed bench_cache/ compile-cache entries.

The XLA persistent-cache key hashes the canonicalized HLO, so ANY edit to
code traced by the benchmark step (models/, ops/, train/engine.py, the
augment pipeline) invalidates the committed entries.  Run this AFTER the
last traced-code change of a round, then commit bench_cache/:

    python tools/refresh_bench_cache.py

It stages a fresh cache dir, runs `bench.py --inner` for the default
(unrolled) and `--scan-stages` configs against the real TPU so exactly the
needed entries are produced, then replaces bench_cache/ with those entries
plus a MANIFEST.json (jax version + file list) that bench.py's orchestrator
uses as its warm/cold signal.
"""

import json
import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGE = os.path.join(HERE, ".cache", "bench_stage")
DEST = os.path.join(HERE, "bench_cache")


def main():
    shutil.rmtree(STAGE, ignore_errors=True)
    os.makedirs(STAGE, exist_ok=True)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = STAGE

    # the three orchestrator variants (bench.py::orchestrate): the unrolled
    # headline, the warm hybrid fallback, and the cold-cache full scan
    for args in ([],
                 ["--scan-stages", "--scan-min-depth", "3"],
                 ["--scan-stages"]):
        cmd = [sys.executable, os.path.join(HERE, "bench.py"),
               "--inner"] + args
        print(f"refresh_bench_cache: running {' '.join(cmd)} "
              f"(cold compile: expect 5-15 min)", flush=True)
        proc = subprocess.run(cmd, env=env, cwd=HERE, timeout=2400)
        if proc.returncode != 0:
            raise SystemExit(f"bench run failed rc={proc.returncode}")

    files = sorted(f for f in os.listdir(STAGE) if f.endswith("-cache"))
    if not files:
        raise SystemExit("no cache entries produced")
    # sanity BEFORE touching the committed directory: every variant's
    # step+init must be present (a run served from an unrelated warm cache
    # would leave gaps), so a failure never destroys the last good cache
    steps = [f for f in files if f.startswith("jit_step-")]
    inits = [f for f in files if f.startswith("jit_init_fn-")]
    assert len(steps) >= 3 and len(inits) >= 3, (steps, inits)

    import jax
    # build the replacement next to DEST, then swap atomically
    new_dest = DEST + ".new"
    shutil.rmtree(new_dest, ignore_errors=True)
    os.makedirs(new_dest)
    total = 0
    for f in files:
        src = os.path.join(STAGE, f)
        total += os.path.getsize(src)
        shutil.copy2(src, os.path.join(new_dest, f))
    with open(os.path.join(new_dest, "MANIFEST.json"), "w") as fh:
        json.dump({"jax": jax.__version__,
                   "device_gen": os.environ.get("PALLAS_AXON_TPU_GEN", ""),
                   "files": files}, fh, indent=1)
    old_dest = DEST + ".old"
    shutil.rmtree(old_dest, ignore_errors=True)
    if os.path.isdir(DEST):
        os.rename(DEST, old_dest)
    os.rename(new_dest, DEST)
    shutil.rmtree(old_dest, ignore_errors=True)
    print(f"refresh_bench_cache: {len(files)} entries, "
          f"{total / 1e6:.0f} MB -> {DEST}")


if __name__ == "__main__":
    main()
