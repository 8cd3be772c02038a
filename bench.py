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


def _run_inner(args, deadline_s, grace_s=0.0):
    """Run `bench.py --inner <args>` with a sentinel-aware wall deadline.

    The inner process touches a BENCH_SENTINEL file once its executable has
    loaded and warmup synced — i.e. once the stall-prone phase (the
    stochastic multi-minute executable-load stall through the axon tunnel,
    BASELINE.md) is behind it and only a bounded measurement remains.  The
    process is killed at ``deadline_s`` only if the sentinel has NOT
    appeared; if warmup finished, it gets ``grace_s`` more to complete the
    measurement instead of being killed mid-flight with the number already
    effectively in hand.

    Returns the parsed JSON result dict, or None.  stderr streams through.
    """
    import tempfile
    sentinel = os.path.join(tempfile.gettempdir(),
                            f"bench_sentinel_{os.getpid()}_{time.monotonic_ns()}")
    env = dict(os.environ, BENCH_SENTINEL=sentinel)
    cmd = [sys.executable, os.path.abspath(__file__), "--inner"] + args
    t0 = time.monotonic()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, cwd=_HERE, env=env)
    deadline = t0 + max(10.0, deadline_s)
    extended = False
    try:
        while True:
            try:
                proc.wait(timeout=min(5.0, max(0.1, deadline -
                                               time.monotonic())))
                break
            except subprocess.TimeoutExpired:
                pass
            if time.monotonic() >= deadline:
                if not extended and grace_s > 0 and os.path.exists(sentinel):
                    extended = True
                    deadline += grace_s
                    print(f"bench: warmup sentinel seen — extending "
                          f"deadline by {grace_s:.0f}s for the measurement",
                          file=sys.stderr)
                    continue
                proc.kill()
                proc.wait()
                print(f"bench: inner run exceeded "
                      f"{time.monotonic() - t0:.0f}s deadline, killed",
                      file=sys.stderr)
                break
        stdout = proc.stdout.read() if proc.stdout else b""
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
        try:
            os.remove(sentinel)
        except OSError:
            pass
    if proc.returncode != 0:
        print(f"bench: inner run ended rc={proc.returncode}; salvaging "
              f"any banked JSON from its stdout", file=sys.stderr)
    # Parse the LAST JSON line the inner managed to print — under
    # --then-upgrade an inner killed mid-upgrade still banked its fallback
    # line (printed and flushed before the upgrade began).
    for line in reversed(stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except ValueError:
                pass
    if proc.returncode == 0:
        print("bench: inner run produced no JSON line", file=sys.stderr)
    return None


def orchestrate():
    """Default entry: deadline-guarded measurement with banked fallbacks.

    Budget model (BENCH_BUDGET_S, default 580 to fit the driver's
    ``timeout 600``): with the committed bench_cache warm, ONE inner
    process banks the hybrid-scan fallback number (~120 img/s, small
    executable) and then upgrades to the unrolled headline in the same
    process; a kill mid-upgrade still returns the banked line.  Cold
    cache: the classic full-scan run (cheapest cold compile) with a
    capped first attempt and a retry.
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
    # rounds 3-5): executable loads through the tunnel stall
    # stochastically, roughly in proportion to executable size.  BANK a
    # number from the hybrid-scan fallback first (scan only the two
    # 9-block stage-3 twins with body unroll — much smaller executable
    # than unrolled, far faster steady state than scanning everything),
    # then spend ALL remaining budget trying to upgrade to the unrolled
    # headline.  Warmup sentinels let a run that already survived its load
    # finish its measurement instead of dying at an arbitrary deadline.
    # Cold cache: the classic full-scan variant is the only one whose cold
    # compile reliably fits the budget.
    fallback = ["--scan-stages", "--scan-min-depth", "3"]
    result = None
    if can_fallback and cache_warm:
        # Warm path: ONE inner process banks the hybrid fallback, prints
        # (and flushes) its JSON line, then upgrades to the unrolled
        # headline in the same process (--then-upgrade) — no second device
        # init, and the 102 MB executable load gets every remaining second.
        # The soft deadline kills the run only if even the hybrid warmup
        # never finished (its load stalled); the sentinel grace then covers
        # the whole remaining budget.  A killed upgrade still returns the
        # banked line (salvaged from stdout).
        remaining = budget - (time.monotonic() - t0)
        result = _run_inner(user_args + fallback + ["--then-upgrade"],
                            300.0, grace_s=remaining - 310.0)
        if result is None:
            remaining = budget - (time.monotonic() - t0)
            if remaining > 60:  # below this a retry cannot even load
                result = _run_inner(user_args + fallback, remaining - 10,
                                    grace_s=0.0)
    elif can_fallback:
        # Cold cache: the classic full-scan variant is the only one whose
        # cold compile reliably fits the budget; no upgrade attempt (a cold
        # unrolled compile alone is ~10 min through the remote service).
        # Cap the first attempt so a stall still leaves a useful retry
        # window (the retry's compile is then warm from the first run's
        # persistent-cache writes).
        remaining = budget - (time.monotonic() - t0)
        result = _run_inner(user_args + ["--scan-stages"],
                            max(60.0, remaining - 170), grace_s=150.0)
        if result is None:
            remaining = budget - (time.monotonic() - t0)
            if remaining > 60:
                result = _run_inner(user_args + ["--scan-stages"],
                                    remaining - 10, grace_s=0.0)
    else:
        # explicit variant requested: single attempt, full budget
        remaining = budget - (time.monotonic() - t0)
        result = _run_inner(user_args, remaining - 10, grace_s=0.0)

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
    p.add_argument("--scan-min-depth", type=int, default=2,
                   help="with --scan-stages: scan only stages with at least "
                        "this many blocks (3 = the hybrid fallback: scan "
                        "just the two 9-block stage-3 twins, unroll the "
                        "rest — smaller executable than unrolled, faster "
                        "steady state than scanning everything)")
    p.add_argument("--scan-unroll", type=int, default=1,
                   help="with --scan-stages: lax.scan body unroll factor "
                        "(identical math/params; restores cross-block "
                        "fusion within each unrolled group at the cost of "
                        "a proportionally larger executable)")
    p.add_argument("--segmented", action="store_true",
                   help="chain per-stage jitted programs with vjp "
                        "recompute (train/segmented.py) instead of one "
                        "monolithic jit — bounds compile memory/time for "
                        "very large images (2048^2); single chip, train "
                        "mode, no augment/grad-accum")
    p.add_argument("--seg-residuals", default="auto",
                   choices=["auto", "save", "recompute"],
                   help="with --segmented: per-segment residual policy "
                        "(train/segmented.py) — 'auto' sizes each "
                        "segment's vjp residuals abstractly and recomputes "
                        "only what exceeds the HBM budget; 'save'/"
                        "'recompute' force the uniform modes")
    p.add_argument("--seg-split", type=int, default=0,
                   help="with --segmented: chunk unscanned stages deeper "
                        "than N blocks into <=N-block segments (finer "
                        "residual grains for the auto policy; 3 is the "
                        "2048^2 sweet spot — see BASELINE.md round 5)")
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
    p.add_argument("--then-upgrade", action="store_true",
                   help="after printing this configuration's JSON line, "
                        "rebuild and measure the default unrolled step in "
                        "the SAME process (cswin train, non-segmented) and "
                        "print a second JSON line — the orchestrator's "
                        "bank-then-upgrade path without a second device "
                        "init/process startup")
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

    def run_measurement(scan, scan_unroll):
        """One full build->compile->load->measure->print cycle for a scan
        configuration (False = unrolled headline; True = scan every multi-
        block stage; int N = hybrid, scan stages with depth >= N).  Called
        twice under --then-upgrade: bank the fallback number, then upgrade
        to the unrolled step IN THE SAME PROCESS — the device handle, cache
        seeding and Python imports are already paid, so the big
        executable's stochastic load gets every remaining second of the
        orchestrator budget (see orchestrate())."""
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
                remat=remat, scan_stages=scan, scan_unroll=scan_unroll)
            opt = "adamw"
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, img, img, 3), opt, 1e-4, 1e-4)

        if args.mode == "train":
            augment = None
            if args.augment:
                from cswin_simam_unet_tpu.data.augment import AugmentConfig
                augment = AugmentConfig()
            if args.segmented:
                assert args.model == "cswin", "--segmented: cswin only"
                from cswin_simam_unet_tpu.train.segmented import (
                    make_segmented_train_step,
                )
                seg_mesh = make_mesh((n_chips,), ("data",)) if n_chips > 1 \
                    else None
                step = make_segmented_train_step(
                    model, n_classes=1, mesh=seg_mesh, augment=augment,
                    grad_accum=args.grad_accum,
                    save_residuals={"auto": "auto", "save": True,
                                    "recompute": False}[args.seg_residuals],
                    depth_split=args.seg_split)
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

        # AOT-compile the single-program paths so the executable is built AND
        # loaded exactly once: the post-measurement `step.lower().compile()`
        # cost-analysis call used to instantiate a SECOND copy of the (up to
        # 102 MB) executable through the tunnel — a second roll of the
        # stochastic load-stall dice (BASELINE.md) after the number was already
        # measured.  The compiled object is reused for warmup, the timed
        # chains, and cost_analysis().
        cost_src = None
        if args.mode == "infer":
            # Serving path: frozen weights, uint8 batch -> normalise -> forward
            # -> probabilities (model.predict = the CLI predict subcommand's
            # compute; ref has no inference entry point at all, ref :537/:992).
            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            predict = jax.jit(lambda v, im: model.predict(
                v, im.astype(jnp.float32) / 255.0))
            t_compile = time.perf_counter()
            predict_c = predict.lower(variables, images).compile()
            cost_src = predict_c

            def step(state, images, masks, rng):  # chain-compatible wrapper
                probs = predict_c(variables, images)
                return state, {"loss": jnp.mean(probs)}
        else:
            t_compile = time.perf_counter()
            if not args.segmented:
                step = step.lower(state, images, masks, rng).compile()
                cost_src = step
        print(f"compile: {time.perf_counter() - t_compile:.1f}s",
              file=sys.stderr)

        t_warm = time.perf_counter()
        for i in range(max(1, args.warmup)):
            state, metrics = step(state, images, masks, rng)
        _ = float(metrics["loss"])  # hard sync (block_until_ready lies, see below)
        print(f"warmup (executable load + {max(1, args.warmup)} steps): "
              f"{time.perf_counter() - t_warm:.1f}s", file=sys.stderr)
        # Tell a watching orchestrator the stall-prone phase is over: from here
        # the run is a bounded measurement (~1-2 min), so its deadline can be
        # relaxed instead of killing a run that already paid the load.
        sentinel = os.environ.get("BENCH_SENTINEL")
        if sentinel:
            with open(sentinel, "w") as fh:
                fh.write(f"{time.monotonic()}\n")

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
            scan_undercount = args.model == "cswin" and bool(scan)
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
                cost = cost_src.cost_analysis()
            elif args.segmented and args.grad_accum == 1:
                # sum of the chain's compiled per-program cost analyses
                # (lowered from concrete-sharding snapshots, so this hits
                # the warmed programs under a DP mesh too — VERDICT r04
                # #3): 'useful' = prep+loss+opt+fwd+bwd once, 'executed'
                # adds any recompute (zero with save_residuals)
                seg_cost = step.cost_flops(state, images, masks, rng)
                cost = {"flops": seg_cost["useful"]}
                flops_executed = seg_cost["executed"]
            elif args.segmented:
                print("MFU skipped for segmented grad-accum", file=sys.stderr)
                cost = None
            else:
                cost = cost_src.cost_analysis()
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
        if scan or args.segmented or args.grad_accum > 1:
            variant = []
            if scan:
                tag = "scan-stages"
                if scan is not True:
                    tag = f"hybrid-scan-d{int(scan)}"
                if scan_unroll > 1:
                    tag += f"-u{scan_unroll}"
                variant.append(tag)
            if args.segmented:
                variant.append("segmented")
            if args.grad_accum > 1:
                variant.append(f"grad-accum-{args.grad_accum}")
            out["variant"] = "+".join(variant)
        print(json.dumps(out), flush=True)

    if not args.scan_stages:
        scan0 = False
    elif args.scan_min_depth <= 2:
        scan0 = True
    else:
        scan0 = args.scan_min_depth
    run_measurement(scan0, args.scan_unroll)
    if (args.then_upgrade and args.scan_stages and args.model == "cswin"
            and args.mode == "train" and not args.segmented):
        print("bench: banked; upgrading to the unrolled step in-process",
              file=sys.stderr)
        run_measurement(False, 1)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        orchestrate()
