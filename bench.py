"""Headline benchmark: images/sec/chip, CSWin-SimAM-UNet 512^2 fwd+bwd.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Matches the BASELINE.json north-star metric: full training step (forward +
backward + optimizer) at 512x512 on the flagship CSWin-SimAM-UNet
(split [1,2,8,8] — the 512-capable geometry), bfloat16 compute / f32 params,
donated jitted step, batch sharded over all available chips.

``vs_baseline`` is the ratio to the measured PyTorch reference throughput in
benchmarks/baseline_measured.json (the reference publishes no numbers;
see benchmarks/measure_reference.py for how the denominator is produced and
on which hardware — recorded in BASELINE.md).

Survivability (the driver runs ``timeout 600 python bench.py`` on a fresh
clone): the default invocation is an ORCHESTRATOR that (a) seeds the XLA
persistent compile cache from the committed ``bench_cache/`` entries, (b)
runs the real measurement in a subprocess with a deadline, (c) falls back
to ``--scan-stages`` (5x cheaper cold compile, see BASELINE.md) if the
fast path cannot finish, and (d) ALWAYS prints the JSON line — degraded
runs report what they measured, failures report value 0 with an ``error``
field rather than dying silently.  ``--inner`` runs the measurement
directly (what the orchestrator spawns).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.path.join(_HERE, ".cache", "jax_tpu")
_SEED_DIR = os.path.join(_HERE, "bench_cache")


def _seed_compile_cache() -> dict:
    """Copy committed bench_cache/ entries into the active compile cache.

    Returns the manifest (or {}).  The manifest records the jax version and
    device generation the entries were compiled for; the orchestrator uses
    a mismatch as the cold-cache signal to skip the unrolled fast path.
    """
    manifest = {}
    mpath = os.path.join(_SEED_DIR, "MANIFEST.json")
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            manifest = {}
    if os.path.isdir(_SEED_DIR):
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            import shutil
            for name in os.listdir(_SEED_DIR):
                if not name.endswith("-cache"):
                    continue
                dst = os.path.join(_CACHE_DIR, name)
                if not os.path.exists(dst):
                    shutil.copy2(os.path.join(_SEED_DIR, name), dst)
        except OSError as e:
            print(f"bench: cache seed failed ({e}); continuing cold",
                  file=sys.stderr)
    return manifest


def _run_inner(args, deadline_s):
    """Run `bench.py --inner <args>` with a wall deadline.

    Returns the parsed JSON result dict, or None.  stderr streams through.
    """
    cmd = [sys.executable, os.path.abspath(__file__), "--inner"] + args
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, cwd=_HERE,
                              timeout=max(10.0, deadline_s))
    except subprocess.TimeoutExpired:
        print(f"bench: inner run exceeded {deadline_s:.0f}s deadline, "
              f"killed", file=sys.stderr)
        return None
    if proc.returncode != 0:
        print(f"bench: inner run failed rc={proc.returncode}",
              file=sys.stderr)
        return None
    for line in reversed(proc.stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                pass
    print("bench: inner run produced no JSON line", file=sys.stderr)
    return None


def orchestrate():
    """Default entry: deadline-guarded measurement with scan-stages fallback.

    Budget model (BENCH_BUDGET_S, default 580 to fit the driver's
    ``timeout 600``): the unrolled fast path gets the budget minus a
    reserve large enough for a COLD ``--scan-stages`` run (~113 s compile
    + device init + measurement, measured in BASELINE.md).  With the
    committed bench_cache both paths are warm and attempt 1 finishes in
    ~2-3 min.
    """
    t0 = time.monotonic()
    budget = float(os.environ.get("BENCH_BUDGET_S", "580"))
    user_args = [a for a in sys.argv[1:] if a != "--inner"]
    manifest = _seed_compile_cache()

    cache_warm = False
    if manifest:
        try:
            import jax
            cache_warm = (manifest.get("jax") == jax.__version__ and all(
                os.path.exists(os.path.join(_CACHE_DIR, n))
                for n in manifest.get("files", [])))
        except Exception:
            cache_warm = False
    print(f"bench: orchestrator budget {budget:.0f}s, "
          f"seeded cache warm={cache_warm}", file=sys.stderr)

    can_fallback = ("--scan-stages" not in user_args
                    and "--model" not in " ".join(user_args))

    # Strategy (timings measured through the axon tunnel, BASELINE.md
    # round 3): the scan-stages run is the RELIABLE one (46 MB executable;
    # warm ~105-185 s end-to-end, cold ~300-400 s), while the unrolled
    # fast path's 102 MB executable load sporadically stalls for minutes.
    # So BANK a scan-stages number first, then spend the remaining budget
    # trying to upgrade to the unrolled measurement (~40% faster steady
    # state when its load cooperates); print the best result that landed.
    result = None
    if can_fallback:
        remaining = budget - (time.monotonic() - t0)
        upgrade_reserve = 220.0 if cache_warm else 0.0
        # Cap the first scan attempt: a warm scan run is ~105-185 s
        # end-to-end, so a run past ~300 s IS the stochastic
        # executable-load stall (measured distribution in BASELINE.md) —
        # kill it early enough that a fresh attempt (whose load re-rolls
        # the dice) still fits.  The retry then gets EVERYTHING left:
        # banking some number beats gambling the rest on the unrolled
        # upgrade (observed 2026-08-21: a night where loads stalled >310 s
        # repeatedly — an aggressive retry reserve turned a would-be
        # banked number into a value-0 run).
        first_cap = min(remaining - upgrade_reserve,
                        300.0 if cache_warm else remaining)
        result = _run_inner(user_args + ["--scan-stages"], first_cap)
        if result is None:
            remaining = budget - (time.monotonic() - t0)
            result = _run_inner(user_args + ["--scan-stages"],
                                remaining - 10)

    if cache_warm or not can_fallback:
        remaining = budget - (time.monotonic() - t0)
        if remaining > (60 if result is None else 150):
            upgraded = _run_inner(user_args, remaining - 10)
            if upgraded is not None:
                result = upgraded
    else:
        print("bench: cold cache -> skipping the unrolled upgrade run",
              file=sys.stderr)

    if result is None:
        # Degraded terminal path: still emit the one parseable JSON line,
        # labelled for the configuration that was actually requested.
        def _flag(name, default):
            # both "--flag value" and "--flag=value" forms
            for i, a in enumerate(user_args):
                if a == name and i + 1 < len(user_args):
                    return user_args[i + 1]
                if a.startswith(name + "="):
                    return a.split("=", 1)[1]
            return default
        label = ("UNet-SimAM" if _flag("--model", "cswin") == "unet"
                 else "CSWin-SimAM-UNet")
        what = ("infer" if _flag("--mode", "train") == "infer"
                else "fwd+bwd+step")
        img = _flag("--image-size", "512")
        result = {"metric": f"{label} {img}^2 {what} images/sec/chip",
                  "value": 0.0, "unit": "images/sec/chip",
                  "vs_baseline": 0.0,
                  "error": "no measurement completed within budget "
                           f"({budget:.0f}s); see stderr"}
    print(json.dumps(result))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--inner", action="store_true",
                   help="run the measurement in-process (no orchestrator "
                        "deadline/fallback wrapper)")
    p.add_argument("--batch-per-chip", type=int, default=8)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=3,
                   help="compile/warmup steps before timing (min 1: the "
                        "warmup sync also materialises `metrics`)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--remat", default="", choices=["", "block", "dots"],
                   help="CSWin block rematerialisation (memory-limited "
                        "configs, e.g. 2048^2; measured LOSS at 512^2 "
                        "batch 8 — see BASELINE.md)")
    p.add_argument("--scan-stages", action="store_true",
                   help="lax.scan over multi-block CSWin stages (stacked "
                        "params) — identical deterministic math, much "
                        "cheaper cold compiles; for measuring the "
                        "compile-time/throughput trade")
    p.add_argument("--segmented", action="store_true",
                   help="chain per-stage jitted programs with vjp "
                        "recompute (train/segmented.py) instead of one "
                        "monolithic jit — bounds compile memory/time for "
                        "very large images (2048^2); single chip, train "
                        "mode, no augment/grad-accum")
    p.add_argument("--grad-accum", type=int, default=1,
                   help="gradient-accumulation micro-batches per optimizer "
                        "step (train mode): measures the accumulation "
                        "overhead for memory-limited configs")
    p.add_argument("--model", default="cswin", choices=["cswin", "unet"])
    p.add_argument("--mode", default="train", choices=["train", "infer"],
                   help="'train' = full fwd+bwd+optimizer step (the "
                        "headline); 'infer' = serving path: uint8 batch -> "
                        "normalise -> forward -> probabilities (train=False, "
                        "no dropout), measuring deployment throughput")
    p.add_argument("--train-drops", dest="train_drops", action="store_true",
                   default=True,
                   help="use the reference CSWin TRAINING regularisation "
                        "(drop/attn-drop/drop-path 0.3, "
                        "train_cswinunet_segmentation.py:921-951) — "
                        "exercises the in-kernel PRNG attention dropout. "
                        "DEFAULT: this is the config the reference actually "
                        "trains, so it is the honest headline")
    p.add_argument("--no-train-drops", dest="train_drops",
                   action="store_false",
                   help="dropout-free variant (inference-style step)")
    p.add_argument("--augment", action="store_true",
                   help="include the on-device augmentation pipeline "
                        "(paired flip/rot90/crop-resize under jit) in the "
                        "timed step — BASELINE.json config 4's "
                        "'with on-device augmentation' measurement")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    # persistent compilation cache (repo-local so it survives VM resets):
    # first run pays full compile, reruns are seconds — essential when
    # driving the TPU through the tunnel
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from cswin_simam_unet_tpu.models import CSWinUNet
    from cswin_simam_unet_tpu.parallel import (
        batch_sharding,
        make_mesh,
        replicated,
        shard_state,
    )
    from cswin_simam_unet_tpu.train.engine import (
        create_train_state,
        make_train_step,
    )

    devices = jax.devices()
    n_chips = len(devices)
    img = args.image_size
    batch = args.batch_per_chip * n_chips
    use_pallas = (not args.no_pallas) and devices[0].platform == "tpu"
    print(f"bench: {n_chips} x {devices[0].device_kind}, img {img}, "
          f"global batch {batch}, dtype {args.dtype}, pallas={use_pallas}",
          file=sys.stderr)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model == "unet":
        from cswin_simam_unet_tpu.models import UNet
        model = UNet(use_simam=True, dtype=dtype)
        opt = "adam"
    else:
        dr = 0.3 if args.train_drops else 0.0
        # reference-default stripes (1,2,7,7) when the geometry allows
        # (448^2: train_cswinunet_segmentation.py:921-933); the [1,2,8,8]
        # variant otherwise (512^2/1024^2 — the ref default can't run those)
        split = (1, 2, 7, 7) if (img // 16) % 7 == 0 else (1, 2, 8, 8)
        remat = {"": False, "block": True, "dots": "dots"}[args.remat]
        model = CSWinUNet(
            img_size=img, use_simam=True, split_size=split,
            num_classes=1, drop_rate=dr, attn_drop_rate=dr,
            drop_path_rate=dr, use_pallas=use_pallas, dtype=dtype,
            remat=remat, scan_stages=args.scan_stages)
        opt = "adamw"
    state = create_train_state(model, jax.random.PRNGKey(0),
                               (1, img, img, 3), opt, 1e-4, 1e-4)

    if args.mode == "train":
        augment = None
        if args.augment:
            from cswin_simam_unet_tpu.data.augment import AugmentConfig
            augment = AugmentConfig()
        if args.segmented:
            assert args.model == "cswin" and not args.augment \
                and args.grad_accum == 1, \
                "--segmented: cswin, no augment/grad-accum"
            from cswin_simam_unet_tpu.train.segmented import (
                make_segmented_train_step,
            )
            seg_mesh = make_mesh((n_chips,), ("data",)) if n_chips > 1 \
                else None
            step = make_segmented_train_step(model, n_classes=1,
                                             mesh=seg_mesh)
        else:
            step = make_train_step(model, n_classes=1, augment=augment,
                                   donate=True, grad_accum=args.grad_accum)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 256, (batch, img, img, 3), dtype=np.uint8)
    masks = (rs.randint(0, 2, (batch, img, img, 1), dtype=np.uint8) * 255)

    if n_chips > 1:
        mesh = make_mesh((n_chips,), ("data",))
        state = shard_state(state, mesh)
        bs = batch_sharding(mesh, 4)
        images = jax.device_put(images, bs)
        masks = jax.device_put(masks, bs)
        rng = jax.device_put(jax.random.key(1, impl='rbg'), replicated(mesh))
    else:
        images = jax.device_put(images)
        masks = jax.device_put(masks)
        rng = jax.random.key(1, impl='rbg')

    if args.mode == "infer":
        # Serving path: frozen weights, uint8 batch -> normalise -> forward
        # -> probabilities (model.predict = the CLI predict subcommand's
        # compute; ref has no inference entry point at all, ref :537/:992).
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        predict = jax.jit(lambda v, im: model.predict(
            v, im.astype(jnp.float32) / 255.0))

        def step(state, images, masks, rng):  # chain-compatible wrapper
            probs = predict(variables, images)
            return state, {"loss": jnp.mean(probs)}

    t_compile = time.perf_counter()
    for i in range(max(1, args.warmup)):
        state, metrics = step(state, images, masks, rng)
    _ = float(metrics["loss"])  # hard sync (block_until_ready lies, see below)
    print(f"warmup+compile: {time.perf_counter() - t_compile:.1f}s",
          file=sys.stderr)

    # Timing note: through the axon remote-TPU tunnel, block_until_ready can
    # return before execution completes — only a VALUE FETCH is a hard sync.
    # Slope method: time N1 and N2 step-chains each ended by a loss fetch;
    # (t2 - t1) / (N2 - N1) cancels the fetch overhead.  Each chain is timed
    # 3x and the MIN taken: one-off tunnel stalls (~300 ms observed) only ADD
    # time, and a stall inside the short chain once produced a 1.45x
    # overestimate of throughput (xplane device wall is the arbiter: the
    # reported step time must match `benchmarks/profile_step.py`'s
    # "module wall" within noise).
    def run_chain(n, state):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            state, metrics = step(state, images, masks, rng)
        loss = float(metrics["loss"])  # hard sync
        return time.perf_counter() - t0, state, loss

    n1 = max(2, args.iters // 5)
    n2 = args.iters
    t1s, t2s = [], []
    for _ in range(3):
        t1, state, _ = run_chain(n1, state)
        t2, state, loss = run_chain(n2, state)
        t1s.append(t1)
        t2s.append(t2)
    per_step = (min(t2s) - min(t1s)) / (n2 - n1)
    ips = batch / per_step
    ips_per_chip = ips / n_chips
    print(f"step time {per_step * 1e3:.1f} ms (slope over {n2}-{n1} steps); "
          f"{ips:.2f} img/s total, {ips_per_chip:.2f} img/s/chip, "
          f"loss={loss:.4f}", file=sys.stderr)

    # MFU: XLA cost-analysis FLOPs of the whole train step / wall time /
    # aggregate peak.  bf16 peak per chip (dense): v5e 197 TF, v4 275 TF,
    # v5p 459 TF, v6e 918 TF.
    mfu = None
    flops_executed = None
    try:
        scan_undercount = args.model == "cswin" and args.scan_stages
        if scan_undercount:
            # XLA cost analysis counts a lax.scan body ONCE regardless of
            # trip count, so scan-stages MFU would be a wrong (low) number
            # (the round-2 "3.6%" artifact) — in BOTH train and infer
            # modes; suppress rather than mislead.
            print("MFU suppressed: scan-stages cost analysis undercounts "
                  "scan bodies (compare step times instead)",
                  file=sys.stderr)
            cost = None
        elif args.mode == "infer":
            cost = predict.lower(variables, images).compile().cost_analysis()
        elif args.segmented and n_chips == 1:
            # sum of the chain's compiled per-program cost analyses:
            # 'useful' = fwd+bwd+opt once (each seg_bwd vjp program holds
            # its fwd AND bwd) — the standard MFU numerator; 'executed'
            # adds the forward chain the backward recomputes.  Single-chip
            # only: cost_flops lowers with bare ShapeDtypeStructs, which
            # under a DP mesh would recompile unsharded variants of every
            # segment instead of hitting the warmed SPMD programs.
            seg_cost = step.cost_flops(state, images, masks, rng)
            cost = {"flops": seg_cost["useful"]}
            flops_executed = seg_cost["executed"]
        elif args.segmented:
            print("MFU skipped for segmented+DP (cost_flops lowers "
                  "unsharded programs; see train/segmented.py)",
                  file=sys.stderr)
            cost = None
        else:
            cost = step.lower(state, images, masks,
                              rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
        kind = devices[0].device_kind.lower()
        peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12,
                 "v5p": 459e12, "v6": 918e12}
        peak = next((v for k, v in peaks.items() if k in kind), None)
        if peak and flops_per_step > 0:
            mfu = flops_per_step / per_step / (peak * n_chips)
            print(f"cost-analysis {flops_per_step / batch / 1e9:.1f} "
                  f"GFLOP/img -> MFU {mfu * 100:.1f}% "
                  f"({devices[0].device_kind} peak {peak / 1e12:.0f} TF/chip)",
                  file=sys.stderr)
            if flops_executed:
                hfu = flops_executed / per_step / (peak * n_chips)
                print(f"segmented chain executes "
                      f"{flops_executed / batch / 1e9:.1f} GFLOP/img "
                      f"(recompute included) -> hardware util "
                      f"{hfu * 100:.1f}%", file=sys.stderr)
    except Exception as e:  # cost analysis is best-effort diagnostics
        print(f"MFU unavailable: {e}", file=sys.stderr)

    vs_baseline = 0.0
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "benchmarks", "baseline_measured.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        key = ("unet_512" if args.model == "unet" else "cswin_512")
        key += "_infer_imgs_per_sec" if args.mode == "infer" \
            else "_imgs_per_sec"
        ref = base.get(key)
        if ref:
            vs_baseline = ips_per_chip / ref
            print(f"reference ({base.get('hardware')}): {ref:.4f} img/s "
                  f"-> vs_baseline {vs_baseline:.2f}x", file=sys.stderr)

    label = ("UNet-SimAM" if args.model == "unet" else "CSWin-SimAM-UNet")
    what = ("infer" if args.mode == "infer" else "fwd+bwd+step")
    out = {
        "metric": f"{label} {img}^2 {what} images/sec/chip",
        "value": round(ips_per_chip, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }
    if mfu is not None:
        out["mfu"] = round(mfu, 4)
    # Same metric name regardless of execution variant (the driver keys on
    # it), but a degraded/banked fallback must be distinguishable from the
    # unrolled headline in the recorded JSON.
    if args.scan_stages or args.segmented or args.grad_accum > 1:
        variant = []
        if args.scan_stages:
            variant.append("scan-stages")
        if args.segmented:
            variant.append("segmented")
        if args.grad_accum > 1:
            variant.append(f"grad-accum-{args.grad_accum}")
        out["variant"] = "+".join(variant)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        orchestrate()
