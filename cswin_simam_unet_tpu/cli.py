"""CLI entry points mirroring the reference's two training scripts.

``python -m cswin_simam_unet_tpu.cli train --config unet --image-dir ...``
reproduces ``train_unet_segmentation.py main()``
(train_unet_segmentation.py:406-547); ``--config cswinunet`` reproduces
``train_cswinunet_segmentation.py main()`` (:844-1002).  Unlike the
reference, paths and hyperparameters are flags, checkpoints are periodic with
auto-resume, and training can data-parallelise over every local TPU chip.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax
import numpy as np

from cswin_simam_unet_tpu.configs import CONFIGS, build_model, get_config
from cswin_simam_unet_tpu.data import (
    DataLoader,
    SegmentationDataSource,
    train_test_indices,
)
from cswin_simam_unet_tpu.train.checkpoint import CheckpointStore
from cswin_simam_unet_tpu.train.engine import (
    FitConfig,
    create_train_state,
    fit,
)
from cswin_simam_unet_tpu.train.reporting import (
    config_banner,
    plot_metrics,
    save_metrics_to_csv,
)


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="cswin_simam_unet_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    t = sub.add_parser("train", help="train a segmentation model")
    t.add_argument("--config", default="unet", choices=sorted(CONFIGS))
    t.add_argument("--image-dir", required=True)
    t.add_argument("--mask-dir", required=True)
    t.add_argument("--output-dir", default=".")
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--batch-size", type=int, default=None)
    t.add_argument("--image-size", type=int, default=None)
    t.add_argument("--lr", type=float, default=None)
    t.add_argument("--seed", type=int, default=None)
    t.add_argument("--no-augment", action="store_true")
    t.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint if present")
    t.add_argument("--init-weights", default=None,
                   help="warm-start from saved weights before training: a "
                        "final-weights .msgpack, a checkpoint directory, or "
                        "a reference-format torch state_dict (.pth/.pt) — "
                        "fine-tune a model trained by the original scripts")
    t.add_argument("--checkpoint-dir", default=None)
    t.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute dtype")
    t.add_argument("--pallas", action="store_true",
                   help="use fused Pallas TPU kernels (auto-disabled off-TPU)")
    t.add_argument("--tensorboard-dir", default=None)
    t.add_argument("--checkpoint-every", type=int, default=1,
                   help="checkpoint period in epochs (0 = final epoch only; "
                        "each save fetches ~full train state off-device)")
    t.add_argument("--grad-accum", type=int, default=None,
                   help="gradient-accumulation micro-batches per optimizer "
                        "step (default: the config's value, usually 1); "
                        "effective-batch training for memory-limited image "
                        "sizes — loss/metrics exactly equal the full "
                        "batch's, ragged last batches handled")
    t.add_argument("--remat", choices=["block", "dots"], default=None,
                   help="backward rematerialisation for CSWin blocks: "
                        "'block' recomputes whole blocks (most "
                        "memory-frugal), 'dots' keeps matmul outputs. "
                        "Slower per step at <=1024^2 (BASELINE.md) — use "
                        "for resolutions that otherwise OOM")
    t.add_argument("--scan-stages", action="store_true",
                   help="lax.scan over multi-block CSWin stages (stacked "
                        "params): identical deterministic outputs, much "
                        "cheaper cold XLA compiles — use for very large "
                        "images where the unrolled graph strains the "
                        "compiler")
    t.add_argument("--segmented", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="per-stage jitted programs with vjp recompute "
                        "(bounded compile memory for 2048^2-class images; "
                        "composes with augment/grad-accum). Default follows the "
                        "config; --no-segmented forces the monolithic step "
                        "even for segmented-by-default configs")
    t.add_argument("--no-progress", action="store_true",
                   help="disable the live in-epoch progress line "
                        "(reference tqdm-postfix equivalent; default on)")
    t.add_argument("--log-every", type=int, default=0,
                   help="additionally print a full per-batch metrics line "
                        "every N batches (0 = off)")
    t.add_argument("--cache-decoded", action="store_true",
                   help="cache decoded+resized samples in host RAM after "
                        "epoch 1 (H*W*4 bytes/sample); identical values, "
                        "skips the JPEG decode on later epochs")

    pr = sub.add_parser("predict", help="segment a directory of images "
                                        "with trained weights")
    pr.add_argument("--config", default="unet", choices=sorted(CONFIGS))
    pr.add_argument("--weights", required=True,
                    help="final-weights .msgpack artifact (from training) "
                         "or a checkpoint directory (latest epoch used)")
    pr.add_argument("--image-dir", required=True)
    pr.add_argument("--output-dir", required=True)
    pr.add_argument("--image-size", type=int, default=None)
    pr.add_argument("--batch-size", type=int, default=8)
    pr.add_argument("--threshold", type=float, default=0.5,
                    help="binary probability threshold (the reference "
                         "evaluates at 0.5); multi-class uses argmax")
    pr.add_argument("--save-probs", action="store_true",
                    help="also save float probabilities as .npy")
    pr.add_argument("--bf16", action="store_true")
    pr.add_argument("--pallas", action="store_true")

    ev = sub.add_parser(
        "evaluate",
        help="evaluate trained weights on an image+mask directory "
             "(same metrics/semantics as the in-training eval)")
    ev.add_argument("--config", default="unet", choices=sorted(CONFIGS))
    ev.add_argument("--weights", required=True,
                    help="final-weights .msgpack artifact or a checkpoint "
                         "directory (latest epoch used)")
    ev.add_argument("--image-dir", required=True)
    ev.add_argument("--mask-dir", required=True)
    ev.add_argument("--image-size", type=int, default=None)
    ev.add_argument("--batch-size", type=int, default=None)
    ev.add_argument("--split", choices=["all", "train", "test"],
                    default="all",
                    help="'all': the whole directory; 'train'/'test': that "
                         "side of the training split (identical sklearn "
                         "index split: config test_split + seed), e.g. to "
                         "re-score a checkpoint on its held-out set")
    ev.add_argument("--seed", type=int, default=None,
                    help="must match the training --seed for --split "
                         "train/test to reproduce the training's index "
                         "split")
    ev.add_argument("--bf16", action="store_true")
    ev.add_argument("--pallas", action="store_true")

    ex = sub.add_parser(
        "export-torch",
        help="export trained weights to a PyTorch state_dict loadable by "
             "the original reference scripts (strict=True)")
    ex.add_argument("--config", default="unet", choices=sorted(CONFIGS))
    ex.add_argument("--weights", required=True,
                    help="final-weights .msgpack artifact or a checkpoint "
                         "directory (latest epoch used)")
    ex.add_argument("--output", required=True,
                    help=".pth output (torch.save format; falls back to "
                         ".npz with a warning if torch is unavailable)")
    ex.add_argument("--image-size", type=int, default=None)

    es = sub.add_parser(
        "export-serving",
        help="export a frozen StableHLO serving artifact (weights baked "
             "in; runs anywhere with jax, no model code needed)")
    es.add_argument("--config", default="unet", choices=sorted(CONFIGS))
    es.add_argument("--weights", required=True,
                    help="final-weights .msgpack artifact, checkpoint "
                         "directory, or reference torch .pth")
    es.add_argument("--output", required=True, help=".stablehlo output path")
    es.add_argument("--batch-size", type=int, default=1,
                    help="serving batch the artifact is specialised to; "
                         "0 = batch-POLYMORPHIC artifact (symbolic batch "
                         "dim, any batch at call time — XLA path only)")
    es.add_argument("--image-size", type=int, default=None)
    es.add_argument("--bf16", action="store_true")
    es.add_argument("--pallas", action="store_true")

    ls = sub.add_parser("list-configs", help="list available configs")
    return p


def _common_overrides(args) -> dict:
    """Config overrides for the flags shared by train/predict/evaluate
    (--image-size/--seed/--bf16/--pallas); one place so the off-TPU
    --pallas downgrade note behaves identically everywhere."""
    o = {}
    if getattr(args, "image_size", None) is not None:
        o["image_size"] = args.image_size
    if getattr(args, "seed", None) is not None:
        o["seed"] = args.seed
    if getattr(args, "bf16", False):
        o["model_dtype"] = "bfloat16"
    if getattr(args, "pallas", False):
        if jax.devices()[0].platform == "tpu":
            o["model_use_pallas"] = True
        else:
            print("--pallas requested but no TPU backend; using XLA kernels")
    return o


def _warn_intensity_masks(source, cfg) -> None:
    """Multiclass configs expect class-id masks; sanity-check the first mask
    host-side and say so loudly if it looks intensity-valued (e.g. 0/255) —
    the device step clips labels into range to keep the CE finite, which
    would otherwise hide the mistake (train and evaluate both)."""
    _, mask0 = source.load(0)
    if int(mask0.max()) >= cfg.model.n_classes:
        print(f"WARNING: mask values reach {int(mask0.max())} but config "
              f"'{cfg.name}' expects class ids < {cfg.model.n_classes}; "
              f"labels will be clipped. Multiclass masks must store "
              f"class ids (0..{cfg.model.n_classes - 1}), not "
              f"intensities.")


def run_train(args) -> int:
    # cold CSWin train-step compiles take ~20 min on TPU; cache them
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    overrides = _common_overrides(args)
    if args.epochs is not None:
        overrides["num_epochs"] = args.epochs
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.lr is not None:
        overrides["learning_rate"] = args.lr
    if args.remat is not None:
        overrides["model_remat"] = (True if args.remat == "block"
                                    else args.remat)
    if args.scan_stages:
        overrides["model_scan_stages"] = True
    cfg = get_config(args.config, **overrides)
    if args.no_augment:
        cfg = dataclasses.replace(cfg, augment=None)

    size = (cfg.image_size, cfg.image_size)
    # Multiclass class-id masks must be resampled nearest-neighbour (host
    # resize AND on-device crop-resize) — bilinear over ids fabricates
    # intermediate classes at boundaries.  Binary masks keep the reference's
    # soft bilinear path (ref :157-158).
    multiclass = cfg.model.n_classes > 1
    if multiclass and cfg.augment is not None:
        cfg = dataclasses.replace(
            cfg, augment=dataclasses.replace(cfg.augment, mask_nearest=True))
    # Two dataset views over the same dirs, augment handled on device;
    # index split identical to the reference (sklearn, seed).
    source = SegmentationDataSource(args.image_dir, args.mask_dir, size,
                                    mask_nearest=multiclass)
    if multiclass:
        _warn_intensity_masks(source, cfg)
    train_idx, test_idx = train_test_indices(len(source), cfg.test_split,
                                             cfg.seed)
    train_loader = DataLoader(source, train_idx, cfg.batch_size, shuffle=True,
                              num_workers=cfg.num_workers, seed=cfg.seed,
                              cache_decoded=args.cache_decoded)
    test_loader = DataLoader(source, test_idx, cfg.batch_size, shuffle=False,
                             num_workers=max(1, cfg.num_workers // 2),
                             cache_decoded=args.cache_decoded)

    model = build_model(cfg.model, cfg.image_size)
    state = create_train_state(
        model, jax.random.PRNGKey(cfg.seed),
        (1, cfg.image_size, cfg.image_size, cfg.model.in_channels),
        optimizer=cfg.optimizer, learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay)

    # Data parallelism: 1-axis ('data',) mesh over all local devices; fit()
    # replicates the state and shards every batch's leading dim, XLA emits
    # the gradient all-reduce over ICI (SURVEY.md §2.5 DP row; the reference
    # is single-device, train_unet_segmentation.py:426).
    mesh = None
    n_dev = len(jax.devices())
    if cfg.data_parallel and n_dev > 1:
        if cfg.batch_size % n_dev == 0:
            from cswin_simam_unet_tpu.parallel import make_mesh
            mesh = make_mesh((n_dev,), ("data",))
        else:
            print(f"data_parallel requested but batch_size {cfg.batch_size} "
                  f"is not divisible by {n_dev} devices; "
                  f"training single-device")

    print(config_banner({
        "config": cfg.name,
        "devices": jax.devices(),
        "mesh": f"{dict(mesh.shape)}" if mesh is not None else "single-device",
        "dataset": f"{len(source)} images "
                   f"({len(train_idx)} train / {len(test_idx)} test)",
        "image_size": cfg.image_size,
        "batch_size": cfg.batch_size,
        "optimizer": cfg.optimizer,
        "learning_rate": cfg.learning_rate,
        "weight_decay": cfg.weight_decay,
        "epochs": cfg.num_epochs,
        "augment": cfg.augment,
        "params": sum(x.size for x in jax.tree_util.tree_leaves(state.params)),
    }))

    ckpt_dir = args.checkpoint_dir or cfg.checkpoint_dir or os.path.join(
        args.output_dir, f"{cfg.output_prefix}_checkpoints")
    store = CheckpointStore(ckpt_dir)

    fit_cfg = FitConfig(
        num_epochs=cfg.num_epochs, n_classes=cfg.model.n_classes,
        augment=cfg.augment, plateau_factor=cfg.plateau_factor,
        plateau_patience=cfg.plateau_patience,
        plateau_min_lr=cfg.plateau_min_lr, seed=cfg.seed,
        checkpoint_manager=store, checkpoint_every=args.checkpoint_every,
        grad_accum=(args.grad_accum if args.grad_accum is not None
                    else cfg.grad_accum),
        segmented=(cfg.segmented if args.segmented is None
                   else args.segmented),
        seg_depth_split=cfg.seg_depth_split,
        progress=not args.no_progress, log_every=args.log_every,
        tensorboard_dir=args.tensorboard_dir)

    if args.init_weights:
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        loaded = _load_variables(model, cfg, cfg.image_size,
                                 args.init_weights, variables=variables)
        state = state.replace(params=loaded["params"],
                              batch_stats=loaded.get("batch_stats"))

    history = scheduler = None
    start_epoch = 0
    global_step = 0
    if args.resume and store.latest_epoch() is not None:
        state, scheduler, history, start_epoch, global_step = \
            store.restore(state)
        print(f"Resumed from epoch {start_epoch}")
    elif store.latest_epoch() is not None:
        print(f"warning: {ckpt_dir} holds checkpoints from a previous run "
              f"(latest epoch {store.latest_epoch()}); starting FRESH and "
              f"clearing them — pass --resume to continue that run instead")
        store.reset()

    state, history = fit(model, state, train_loader, test_loader, fit_cfg,
                         history=history, scheduler=scheduler,
                         start_epoch=start_epoch, global_step=global_step,
                         mesh=mesh)

    prefix = os.path.join(args.output_dir, cfg.output_prefix)
    save_metrics_to_csv(history, f"{prefix}_training_metrics.csv")
    plot_metrics(history, f"{prefix}_training_metrics.png", title=cfg.name)
    # final-weights artifact, parity with the reference's one-shot
    # torch.save(model.state_dict()) (ref :537/:992)
    from cswin_simam_unet_tpu.train.checkpoint import save_weights
    save_weights(f"{prefix}_final_weights.msgpack", state)
    best_epoch, best_dice = store.best_epoch()
    best = store.best_weights_path()
    print(f"Done. Best test Dice {best_dice:.4f} at epoch {best_epoch}"
          f"{f' (weights: {best})' if best else ''}. "
          f"Artifacts: {prefix}_training_metrics.{{csv,png}}, "
          f"{prefix}_final_weights.msgpack, checkpoints in {ckpt_dir}")
    store.close()
    return 0


def run_predict(args) -> int:
    """Batch inference: jpgs in, uint8 mask pngs out.

    The reference has no inference entry point at all — a trained model is
    only usable by writing new code against the saved state_dict (ref
    :537/:992).  Here ``predict`` closes the deploy loop: probabilities via
    the model's reference-compatible ``predict`` (sigmoid/softmax), binary
    masks thresholded at --threshold (the reference's eval threshold,
    train_unet_segmentation.py:292), multi-class via argmax class ids.
    """
    from glob import glob as _glob

    import jax.numpy as jnp

    from cswin_simam_unet_tpu.data.dataset import decode_resize
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.config, **_common_overrides(args))
    size = cfg.image_size
    n_classes = cfg.model.n_classes

    model = build_model(cfg.model, size)
    variables = _load_variables(model, cfg, size, args.weights)

    @jax.jit
    def predict_batch(images_u8):
        probs = model.predict(variables, images_u8.astype(jnp.float32) / 255.0)
        if n_classes == 1:
            return (probs[..., 0] > args.threshold).astype(jnp.uint8) * 255, \
                probs[..., 0]
        return jnp.argmax(probs, axis=-1).astype(jnp.uint8), probs

    paths = sorted(_glob(os.path.join(args.image_dir, "*.jpg")))
    if not paths:
        raise ValueError(f"no images found in directory: {args.image_dir}")
    os.makedirs(args.output_dir, exist_ok=True)

    bs = args.batch_size
    n_done = 0
    for i in range(0, len(paths), bs):
        chunk = paths[i:i + bs]
        imgs = []
        for p in chunk:
            with open(p, "rb") as f:
                arr = decode_resize(f.read(), (size, size))
            if arr is None:
                raise ValueError(f"undecodable image: {p}")
            imgs.append(arr)
        batch = np.stack(imgs)
        pad = bs - len(chunk)
        if pad:  # pad the tail so one compiled shape serves every batch
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        masks, probs = predict_batch(batch)
        masks = np.asarray(masks)[:len(chunk)]
        for p, m in zip(chunk, masks):
            base = os.path.splitext(os.path.basename(p))[0]
            out_path = os.path.join(args.output_dir, f"{base}_mask.png")
            _write_png(out_path, m)
            n_done += 1
        if args.save_probs:
            pr = np.asarray(probs, np.float32)[:len(chunk)]
            for p, q in zip(chunk, pr):
                base = os.path.splitext(os.path.basename(p))[0]
                np.save(os.path.join(args.output_dir, f"{base}_probs.npy"), q)
    print(f"Wrote {n_done} masks to {args.output_dir}")
    return 0


def _load_variables(model, cfg, size: int, weights: str,
                    variables: dict | None = None) -> dict:
    """Load model variables from a final-weights .msgpack, a checkpoint dir,
    or a reference-format torch state_dict (.pth/.pt, or the .npz fallback
    export-torch writes on torch-less machines).  The torch path is the
    migration entry point: the reference's ONE training artifact is
    ``torch.save(model.state_dict())`` (ref :537/:992), and it loads here
    directly.  ``variables`` lets callers that already initialised the model
    skip the second init."""
    import jax.numpy as jnp
    from flax import serialization

    if variables is None:
        x0 = jnp.zeros((1, size, size, cfg.model.in_channels), jnp.float32)
        variables = jax.jit(lambda r: model.init(r, x0, train=False))(
            jax.random.PRNGKey(0))
    from cswin_simam_unet_tpu.compat.io import TORCH_SUFFIXES
    if weights.endswith(TORCH_SUFFIXES):
        from cswin_simam_unet_tpu.compat.io import (
            import_torch_file,
            merge_imported_variables,
        )
        imported = import_torch_file(weights, cfg.model.family,
                                     depth=cfg.model.depth)
        variables = merge_imported_variables(variables, imported,
                                             source=weights)
        print(f"Imported reference torch weights from {weights}")
    elif os.path.isdir(weights):  # checkpoint dir: restore latest epoch
        from cswin_simam_unet_tpu.compat.io import merge_imported_variables
        from cswin_simam_unet_tpu.train.checkpoint import CheckpointStore
        store = CheckpointStore(weights)
        payload, epoch = store.restore_weights()
        store.close()
        variables = merge_imported_variables(variables, payload,
                                             source=weights)
        print(f"Loaded checkpoint epoch {epoch} from {weights}")
    else:
        template = {"params": jax.device_get(variables["params"])}
        if "batch_stats" in variables:
            template["batch_stats"] = jax.device_get(
                variables["batch_stats"])
        with open(weights, "rb") as f:
            payload = serialization.from_bytes(template, f.read())
        variables = dict(variables, **payload)
        print(f"Loaded weights from {weights}")
    return variables


def run_evaluate(args) -> int:
    """Post-hoc evaluation from saved weights, byte-identical semantics to
    the per-epoch in-training eval (``engine.make_eval_step`` +
    ``engine.evaluate``: thresholded preds vs soft targets, uniform mean
    over batches — ref evaluate_model, train_unet_segmentation.py:274-309).

    The reference offers no way to score a saved model at all; this closes
    the loop for checkpoints and final-weights artifacts.
    """
    from cswin_simam_unet_tpu.train.engine import evaluate, make_eval_step
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    overrides = _common_overrides(args)
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    cfg = get_config(args.config, **overrides)
    size = (cfg.image_size, cfg.image_size)
    multiclass = cfg.model.n_classes > 1
    source = SegmentationDataSource(args.image_dir, args.mask_dir, size,
                                    mask_nearest=multiclass)
    if multiclass:
        _warn_intensity_masks(source, cfg)
    if args.split == "all":
        idx = list(range(len(source)))
    else:
        train_idx, test_idx = train_test_indices(len(source), cfg.test_split,
                                                 cfg.seed)
        idx = train_idx if args.split == "train" else test_idx
    loader = DataLoader(source, idx, cfg.batch_size, shuffle=False,
                        num_workers=max(1, cfg.num_workers // 2))

    model = build_model(cfg.model, cfg.image_size)
    variables = _load_variables(model, cfg, cfg.image_size, args.weights)
    # The jitted eval step takes the state pytree, but eval only touches
    # params/batch_stats/apply_fn — wrap the loaded weights directly (no
    # second model init; the optimizer state is allocated but never read).
    from cswin_simam_unet_tpu.train.engine import TrainState, make_optimizer
    state = TrainState.create(
        apply_fn=model.apply, params=variables["params"],
        batch_stats=variables.get("batch_stats"),
        tx=make_optimizer(cfg.optimizer, cfg.learning_rate,
                          cfg.weight_decay))
    metrics = evaluate(make_eval_step(model, cfg.model.n_classes), state,
                       loader)
    print(f"Evaluated {len(idx)} images (split={args.split}): "
          f"Loss: {metrics['loss']:.6f}, Dice: {metrics['dice']:.6f}, "
          f"IoU: {metrics['iou']:.6f}")
    return 0


def run_export_torch(args) -> int:
    """Export trained weights as a reference-loadable torch state_dict.

    The inverse of the parity importer: the produced file loads into the
    original scripts' modules (train_unet_segmentation.py:221-250 /
    train_cswinunet_segmentation.py:489-688) with strict=True, closing the
    parity loop in the user direction (framework -> reference).
    """
    overrides = {}
    if args.image_size is not None:
        overrides["image_size"] = args.image_size
    cfg = get_config(args.config, **overrides)
    model = build_model(cfg.model, cfg.image_size)
    variables = jax.device_get(
        _load_variables(model, cfg, cfg.image_size, args.weights))

    if cfg.model.family == "unet":
        from cswin_simam_unet_tpu.compat import export_unet_variables
        sd = export_unet_variables(variables)
    else:
        from cswin_simam_unet_tpu.compat import export_cswin_variables
        sd = export_cswin_variables(variables, depth=cfg.model.depth)

    try:
        import torch
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                    for k, v in sd.items()}, args.output)
        print(f"Wrote torch state_dict ({len(sd)} tensors) to {args.output}")
    except ImportError:
        out = args.output if args.output.endswith(".npz") \
            else args.output + ".npz"
        np.savez(out, **sd)
        print(f"torch unavailable; wrote numpy archive to {out} "
              f"(load and torch.save it on a torch machine)")
    return 0


def _write_png(path: str, mask_u8: np.ndarray) -> None:
    try:
        import cv2
        if not cv2.imwrite(path, mask_u8):  # returns False instead of raising
            raise IOError(f"cv2.imwrite failed for {path}")
    except ImportError:
        from PIL import Image
        Image.fromarray(mask_u8).save(path)


def run_export_serving(args) -> int:
    """Freeze the deployment computation (uint8 -> probabilities, weights
    as constants) into a StableHLO artifact via jax.export.  The reference
    has no inference entry point at all (ref :537/:992); this plus
    ``serving.load_serving`` is the deploy story."""
    from cswin_simam_unet_tpu.serving import export_serving, save_serving
    from cswin_simam_unet_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.config, **_common_overrides(args))
    size = cfg.image_size
    model = build_model(cfg.model, size)
    variables = _load_variables(model, cfg, size, args.weights)
    bs = args.batch_size if args.batch_size > 0 else None
    blob = export_serving(model, variables, batch_size=bs,
                          image_size=size,
                          in_channels=cfg.model.in_channels)
    save_serving(args.output, blob)
    print(f"Exported serving artifact: {args.output} "
          f"({len(blob) / 1e6:.1f} MB, batch "
          f"{'POLYMORPHIC' if bs is None else bs}, "
          f"{size}^2, platform "
          f"{jax.devices()[0].platform})")
    return 0


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    if args.command == "predict":
        return run_predict(args)
    if args.command == "export-serving":
        return run_export_serving(args)
    if args.command == "evaluate":
        return run_evaluate(args)
    if args.command == "export-torch":
        return run_export_torch(args)
    if args.command == "list-configs":
        for name in sorted(CONFIGS):
            c = CONFIGS[name]
            print(f"{name}: {c.model.family} img={c.image_size} "
                  f"bs={c.batch_size} opt={c.optimizer} "
                  f"simam={c.model.use_simam} classes={c.model.n_classes}")
        return 0
    return run_train(args)


if __name__ == "__main__":
    sys.exit(main())
