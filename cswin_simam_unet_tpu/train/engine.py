"""Jitted train/eval steps and the epoch-level fit loop.

Parity targets: ``train_model`` / ``evaluate_model``
(train_unet_segmentation.py:274-402, train_cswinunet_segmentation.py:711-841):
per-epoch train pass with per-batch Dice/IoU, full test-set eval every epoch,
ReduceLROnPlateau stepped on the **test** loss, a 7-series history dict, and
uniform-over-batches metric averaging (the reference's partial-last-batch
quirk, kept for parity).

TPU-first differences: the whole hot path — uint8 -> float normalise ->
augment -> forward -> loss -> backward -> optimizer -> metrics — is ONE
jitted, donated computation per batch; only 4 scalars come back to host per
step (loss/dice/iou + nothing else), so there is no per-batch D2H sync of
tensors like the reference's ``loss.item()`` pattern (ref :359).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from cswin_simam_unet_tpu.data.augment import AugmentConfig, augment_batch
from cswin_simam_unet_tpu.train.losses import segmentation_loss
from cswin_simam_unet_tpu.train.metrics import (
    dice_coefficient,
    iou_score,
    multiclass_metrics,
    threshold_predictions,
)
from cswin_simam_unet_tpu.train.schedule import ReduceLROnPlateau


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def make_optimizer(kind: str, learning_rate: float, weight_decay: float):
    """Optimizers with torch-identical update rules, LR injectable so the
    plateau scheduler can adjust it between epochs.

    'adam'  — torch Adam with L2-coupled weight decay (grad += wd * p before
              the moment updates), the UNet config (ref :486-500).
    'adamw' — torch AdamW decoupled decay, the CSWin config (ref :937-951).

    Measured dead end (v5e, 512^2 CSWin step): wrapping these in
    ``optax.flatten`` to collapse the ~100 per-leaf update fusions
    (~3.4 ms/step) into one raveled pass made the step 4.1 ms SLOWER —
    the two 94 MB ravel/unravel concats plus losing XLA's fusion of each
    update into its weight cost more than the per-leaf overhead saved.
    """
    if kind == "adam":
        def factory(learning_rate):
            return optax.chain(
                optax.add_decayed_weights(weight_decay),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(-learning_rate),
            )
    elif kind == "adamw":
        def factory(learning_rate):
            return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                               weight_decay=weight_decay)
    else:
        raise ValueError(f"unknown optimizer: {kind}")
    return optax.inject_hyperparams(factory)(learning_rate=learning_rate)


def set_learning_rate(state: TrainState, lr: float) -> None:
    """Update the injected LR in-place (optax InjectHyperparamsState)."""
    state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
        lr, dtype=state.opt_state.hyperparams["learning_rate"].dtype)


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def create_train_state(model, rng: jax.Array, input_shape,
                       optimizer: str = "adam", learning_rate: float = 1e-3,
                       weight_decay: float = 1e-4) -> TrainState:
    tx = make_optimizer(optimizer, learning_rate, weight_decay)

    # The whole init runs under jit: eager flax init dispatches hundreds of
    # individual ops, which is pathological over a remote-TPU link (measured
    # 292s eager vs <15s jitted for CSWin-UNet at 256^2).
    def init_fn(rng):
        variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                               train=False)
        return TrainState.create(
            apply_fn=model.apply,
            params=variables["params"],
            batch_stats=variables.get("batch_stats"),
            tx=tx,
        )

    return jax.jit(init_fn)(rng)


def _prepare_batch(images_u8, masks_u8, n_classes: int):
    images = images_u8.astype(jnp.float32) / 255.0
    if n_classes == 1:
        masks = masks_u8.astype(jnp.float32) / 255.0
    else:
        # class ids as float; the augment path must use nearest-neighbour
        # mask resampling (AugmentConfig.mask_nearest) — the round in
        # _finalize_targets only absorbs FP noise, not interpolation
        masks = masks_u8.astype(jnp.float32)
    return images, masks


def _finalize_targets(masks, n_classes: int):
    if n_classes == 1:
        return masks
    # Clip to the valid label range: an out-of-range id (e.g. a binary
    # 0/255 intensity mask fed to a multiclass config) would otherwise
    # gather out of bounds inside the integer-label CE, which JAX fills
    # with NaN — poisoning the loss while dice/iou (one_hot: zeros) stay
    # finite.  The CLI warns host-side when mask values exceed the range.
    ids = jnp.round(masks[..., 0]).astype(jnp.int32)
    return jnp.clip(ids, 0, n_classes - 1)


def _batch_metrics(logits, targets, n_classes: int):
    if n_classes == 1:
        # sigmoid(x) > 0.5  <=>  x > 0 (monotone, exact at the boundary):
        # the reference's threshold-after-sigmoid (ref :351-356) without
        # materialising a full-resolution f32 probability map each step.
        preds = threshold_predictions(logits.astype(jnp.float32), thresh=0.0)
        return dice_coefficient(preds, targets), iou_score(preds, targets)
    # argmax(softmax(x)) == argmax(x): the softmax pass is skippable too
    onehot = jax.nn.one_hot(targets, n_classes, dtype=jnp.float32)
    return multiclass_metrics(logits.astype(jnp.float32), onehot)


def _metric_sums(logits, targets, n_classes: int) -> jnp.ndarray:
    """Raw (intersection, |P|, |T|) sums, shape (3, n_classes).

    Dice/IoU are ratios of global sums, so micro-batch sums ADD — a
    gradient-accumulated step can reduce these across micro-batches and
    recover *exactly* the metrics the full batch would produce (a mean of
    per-micro Dice values would not).
    """
    if n_classes == 1:
        preds = threshold_predictions(logits.astype(jnp.float32), thresh=0.0)
        p = preds.reshape(-1)
        t = targets.reshape(-1).astype(jnp.float32)
        return jnp.stack([jnp.sum(p * t), jnp.sum(p), jnp.sum(t)])[:, None]
    pred_onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), n_classes,
                                 dtype=jnp.float32)
    target_onehot = jax.nn.one_hot(targets, n_classes, dtype=jnp.float32)
    axes = tuple(range(pred_onehot.ndim - 1))
    return jnp.stack([jnp.sum(pred_onehot * target_onehot, axis=axes),
                      jnp.sum(pred_onehot, axis=axes),
                      jnp.sum(target_onehot, axis=axes)])


def _metrics_from_sums(sums: jnp.ndarray, smooth: float = 1e-6):
    """(mean per-class Dice, mean per-class IoU) from stacked (3, C) sums;
    identical to dice_coefficient/iou_score (C=1) and multiclass_metrics."""
    inter, sp, st = sums[0], sums[1], sums[2]
    dice = jnp.mean((2.0 * inter + smooth) / (sp + st + smooth))
    iou = jnp.mean((inter + smooth) / (sp + st - inter + smooth))
    return dice, iou


def _flat_head(model, n_classes: int) -> bool:
    """Use the model's pre-pixel-shuffle logits layout in the step?  BCE and
    dice/IoU are global means over pixels (permutation-invariant), so the
    step can unshuffle the small targets once instead of unscrambling
    full-resolution logits every forward (binary heads only — multiclass
    softmax needs a contiguous class axis)."""
    return n_classes == 1 and getattr(model, "supports_flat_logits", False)


def make_train_step(model, n_classes: int = 1,
                    augment: Optional[AugmentConfig] = None,
                    donate: bool = True, grad_accum: int = 1) -> Callable:
    """Build the jitted train step: (state, images_u8, masks_u8, rng) ->
    (state, {'loss','dice','iou'}).

    ``grad_accum=A`` (framework extension; nothing equivalent in the
    reference) splits the batch into A equal micro-batches under
    ``lax.scan``, averaging the gradients and taking ONE optimizer step —
    effective-batch training for memory-limited configs (1024²+/2048²
    where per-chip batch is 1-2).  Loss and Dice/IoU are reduced from raw
    sums, so the reported metrics equal the full batch's exactly; with
    dropout/augment active the per-micro RNG folds differ from the
    single-shot step's (a different, equally valid sample).  BatchNorm
    running stats update sequentially per micro-batch.
    """
    flat = _flat_head(model, n_classes)
    apply_kw = {"flat_logits": True} if flat else {}
    accum = int(grad_accum)
    if accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def _prep(images_u8, masks_u8, k_aug):
        """uint8 micro-batch -> (normalised images, final targets)."""
        images, masks = _prepare_batch(images_u8, masks_u8, n_classes)
        if augment is not None:
            images, masks = augment_batch(k_aug, images, masks, augment)
        targets = _finalize_targets(masks, n_classes)
        if flat and augment is not None:
            from cswin_simam_unet_tpu.ops.windows import pixel_unshuffle
            targets = pixel_unshuffle(targets, model.FLAT_HEAD_FACTOR)
        return images, targets

    def _loss_grads(params, batch_stats, images, targets, k_drop):
        use_bn = batch_stats is not None

        def loss_fn(params):
            variables = {"params": params}
            if use_bn:
                variables["batch_stats"] = batch_stats
                logits, updates = model.apply(
                    variables, images, train=True,
                    rngs={"dropout": k_drop}, mutable=["batch_stats"],
                    **apply_kw)
                new_bs = updates["batch_stats"]
            else:
                logits = model.apply(variables, images, train=True,
                                     rngs={"dropout": k_drop}, **apply_kw)
                new_bs = None
            loss = segmentation_loss(logits, targets, n_classes)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        return loss, jax.lax.stop_gradient(logits), new_bs, grads

    def step(state: TrainState, images_u8, masks_u8, rng):
        k_aug, k_drop = jax.random.split(rng)
        if flat and augment is None:
            # unshuffle the targets while still uint8: same values (scaling
            # is elementwise), 4x less transpose traffic and no full-res f32
            # intermediate.  With augmentation the masks must stay at image
            # resolution until after the paired transform.
            from cswin_simam_unet_tpu.ops.windows import pixel_unshuffle
            masks_u8 = pixel_unshuffle(masks_u8, model.FLAT_HEAD_FACTOR)

        if accum == 1:
            images, targets = _prep(images_u8, masks_u8, k_aug)
            loss, logits, new_bs, grads = _loss_grads(
                state.params, state.batch_stats, images, targets, k_drop)
            state = state.apply_gradients(grads=grads)
            if new_bs is not None:
                state = state.replace(batch_stats=new_bs)
            dice, iou = _batch_metrics(logits, targets, n_classes)
            return state, {"loss": loss, "dice": dice, "iou": iou}

        batch = images_u8.shape[0]
        if batch % accum == 0:
            # equal micro-batches: lax.scan, uniform 1/accum weights
            im = images_u8.reshape(
                (accum, batch // accum) + images_u8.shape[1:])
            mk = masks_u8.reshape((accum, batch // accum) + masks_u8.shape[1:])

            def micro(carry, xs):
                grad_sum, batch_stats, loss_sum, metric_sums = carry
                i, im_i, mk_i = xs
                images, targets = _prep(im_i, mk_i,
                                        jax.random.fold_in(k_aug, i))
                loss, logits, new_bs, grads = _loss_grads(
                    state.params, batch_stats, images, targets,
                    jax.random.fold_in(k_drop, i))
                grad_sum = jax.tree.map(jnp.add, grad_sum, grads)
                metric_sums = metric_sums + _metric_sums(logits, targets,
                                                         n_classes)
                return (grad_sum, new_bs, loss_sum + loss, metric_sums), None

            zero_grads = jax.tree.map(jnp.zeros_like, state.params)
            init = (zero_grads, state.batch_stats,
                    jnp.zeros((), jnp.float32),
                    jnp.zeros((3, n_classes), jnp.float32))
            (grad_sum, new_bs, loss_sum, metric_sums), _ = jax.lax.scan(
                micro, init, (jnp.arange(accum), im, mk))
            grads = jax.tree.map(lambda g: g / accum, grad_sum)
            loss = loss_sum / accum
        else:
            # ragged batch (e.g. the loader's partial last batch,
            # drop_last=False reference semantics): unequal micro-batches
            # unrolled at trace time, each weighted by its sample share so
            # loss/grads still equal the full batch's pixel mean exactly.
            # A ragged batch shape recompiles the plain step too, so the
            # one-off trace is no extra cost.
            bounds = np.linspace(0, batch, min(accum, batch) + 1,
                                 dtype=np.int64)
            grad_sum = jax.tree.map(jnp.zeros_like, state.params)
            batch_stats = state.batch_stats
            loss = jnp.zeros((), jnp.float32)
            metric_sums = jnp.zeros((3, n_classes), jnp.float32)
            for i, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
                w = (hi - lo) / batch
                images, targets = _prep(images_u8[lo:hi], masks_u8[lo:hi],
                                        jax.random.fold_in(k_aug, i))
                mloss, logits, batch_stats, grads = _loss_grads(
                    state.params, batch_stats, images, targets,
                    jax.random.fold_in(k_drop, i))
                grad_sum = jax.tree.map(lambda a, g: a + w * g,
                                        grad_sum, grads)
                loss = loss + w * mloss
                metric_sums = metric_sums + _metric_sums(logits, targets,
                                                         n_classes)
            grads = grad_sum
            new_bs = batch_stats

        state = state.apply_gradients(grads=grads)
        if new_bs is not None:
            state = state.replace(batch_stats=new_bs)
        dice, iou = _metrics_from_sums(metric_sums)
        return state, {"loss": loss, "dice": dice, "iou": iou}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, n_classes: int = 1) -> Callable:
    """Build the jitted eval step: (state, images_u8, masks_u8) -> metrics."""
    flat = _flat_head(model, n_classes)
    apply_kw = {"flat_logits": True} if flat else {}

    def step(state: TrainState, images_u8, masks_u8):
        if flat:
            # eval never augments: unshuffle the uint8 targets up front
            # (same values as unshuffling the scaled f32 masks, 4x less
            # transpose traffic)
            from cswin_simam_unet_tpu.ops.windows import pixel_unshuffle
            masks_u8 = pixel_unshuffle(masks_u8, model.FLAT_HEAD_FACTOR)
        images, masks = _prepare_batch(images_u8, masks_u8, n_classes)
        targets = _finalize_targets(masks, n_classes)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        logits = state.apply_fn(variables, images, train=False, **apply_kw)
        loss = segmentation_loss(logits, targets, n_classes)
        dice, iou = _batch_metrics(logits, targets, n_classes)
        return {"loss": loss, "dice": dice, "iou": iou}

    return jax.jit(step)


def evaluate(eval_step: Callable, state: TrainState, loader,
             data_sharding=None) -> Dict[str, float]:
    """Full-dataset eval; uniform mean over batches (ref :274-309).

    Per-batch metrics stay on device (async dispatch); one ``device_get``
    at the end fetches them all — no per-batch D2H sync (the reference's
    ``loss.item()`` anti-pattern, ref :359, at eval granularity).
    """
    from cswin_simam_unet_tpu.data.pipeline import device_prefetch
    per_batch = []
    for images, masks in device_prefetch(loader, sharding=data_sharding):
        per_batch.append(eval_step(state, images, masks))
    if not per_batch:
        return {k: float("nan") for k in ("loss", "dice", "iou")}
    fetched = jax.device_get(per_batch)
    return {k: float(np.mean([m[k] for m in fetched]))
            for k in ("loss", "dice", "iou")}


@dataclass
class FitConfig:
    num_epochs: int = 100
    n_classes: int = 1
    augment: Optional[AugmentConfig] = AugmentConfig()
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    plateau_min_lr: float = 1e-7
    grad_accum: int = 1  # micro-batches per optimizer step (1 = off)
    # Chain per-stage jitted programs (train/segmented.py) instead of one
    # monolithic jit: bounded compile memory/time for very large images
    # (2048^2).  CSWin models only; mutually exclusive with augment /
    # grad_accum / multi-device mesh.
    segmented: bool = False
    # with segmented: chunk unscanned stages deeper than N blocks into
    # <=N-block segments (train/segmented.py depth_split)
    seg_depth_split: int = 0
    seed: int = 42
    log_every: int = 0  # batches; 0 = epoch-level only
    # Live in-epoch progress line (reference tqdm postfix Loss/Dice/IoU,
    # train_unet_segmentation.py:335,364-368) — default ON; refreshes from
    # completed device scalars at a bounded rate, never a per-batch sync.
    progress: bool = True
    checkpoint_manager: Any = None  # train.checkpoint.CheckpointStore
    # Checkpoint period in epochs; the final epoch is always saved.  Each
    # save fetches the full train state D2H (~280 MB for CSWin-UNet +
    # AdamW) — every-epoch saving is the crash-safe default, but over a
    # thin host<->TPU link it can rival the epoch's compute time.
    checkpoint_every: int = 1
    tensorboard_dir: Optional[str] = None
    verbose: bool = True


def empty_history() -> Dict[str, list]:
    return {k: [] for k in (
        "train_loss", "train_dice", "train_iou",
        "test_loss", "test_dice", "test_iou", "learning_rates")}


def fit(model, state: TrainState, train_loader, test_loader,
        cfg: FitConfig, history: Optional[Dict[str, list]] = None,
        scheduler: Optional[ReduceLROnPlateau] = None,
        start_epoch: int = 0, global_step: int = 0, mesh=None):
    """Epoch loop with reference-identical bookkeeping (ref :313-402).

    Returns (state, history).  Supports trajectory-exact resume via
    ``start_epoch`` + ``global_step`` + pre-loaded ``history``/``scheduler``/
    ``state`` (the reference loses the whole run on a crash; SURVEY.md §5):
    the augmentation/dropout RNG folds and the loader shuffle order are pure
    functions of (seed, epoch, global_step), all checkpointed.

    With ``mesh`` (a 1-axis ``('data',)`` jax Mesh) the state is replicated
    over the mesh and every batch is sharded over its leading dim — XLA emits
    the gradient all-reduce over ICI.  Batches are moved host->device through
    a double-buffered prefetcher either way, so H2D overlaps compute.
    """
    from cswin_simam_unet_tpu.data.pipeline import device_prefetch

    if cfg.segmented:
        from cswin_simam_unet_tpu.models import CSWinUNet
        if not isinstance(model, CSWinUNet):
            raise ValueError("--segmented supports the CSWin family only "
                             f"(got {type(model).__name__}); UNet's "
                             "monolithic graph compiles fine at any size "
                             "it fits in memory")
        from cswin_simam_unet_tpu.train.segmented import (
            make_segmented_train_step,
        )
        train_step = make_segmented_train_step(
            model, cfg.n_classes, mesh=mesh, augment=cfg.augment,
            grad_accum=cfg.grad_accum,
            depth_split=getattr(cfg, "seg_depth_split", 0))
        # the monolithic eval graph is compile-bounded at 2048^2 too
        eval_step = train_step.eval_step
    else:
        train_step = make_train_step(model, cfg.n_classes, cfg.augment,
                                     grad_accum=cfg.grad_accum)
        eval_step = make_eval_step(model, cfg.n_classes)
    if scheduler is None:
        scheduler = ReduceLROnPlateau(
            lr=get_learning_rate(state), factor=cfg.plateau_factor,
            patience=cfg.plateau_patience, min_lr=cfg.plateau_min_lr)
    history = history if history is not None else empty_history()
    # rbg keys: dropout/drop-path mask bits come from the TPU hardware RNG
    # instead of threefry lane arithmetic — the reference CSWin training
    # config (drop/attn-drop/drop-path 0.3) measured 52.6 -> 134.1
    # img/s/chip at 512^2 from this alone.  Same statistics; fold_in/split
    # semantics (trajectory-exact resume) are impl-independent.
    base_rng = jax.random.key(cfg.seed, impl="rbg")
    data_sharding = None
    if mesh is not None:
        from cswin_simam_unet_tpu.parallel import batch_sharding, shard_state
        state = shard_state(state, mesh)
        data_sharding = batch_sharding(mesh, 4)
    tb = None
    if cfg.tensorboard_dir:
        from cswin_simam_unet_tpu.train.reporting import TensorBoardLogger
        tb = TensorBoardLogger(cfg.tensorboard_dir)

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        if hasattr(train_loader, "set_epoch"):
            train_loader.set_epoch(epoch)
        per_batch = []
        n_images = 0
        progress = None
        if cfg.verbose and cfg.progress:
            from cswin_simam_unet_tpu.train.reporting import EpochProgress
            total = len(train_loader) if hasattr(train_loader, "__len__") \
                else None
            progress = EpochProgress(epoch, cfg.num_epochs, total)
        for images, masks in device_prefetch(train_loader,
                                             sharding=data_sharding):
            rng = jax.random.fold_in(base_rng, epoch * 1_000_000 + global_step)
            state, m = train_step(state, images, masks, rng)
            per_batch.append(m)  # device scalars; fetched once per epoch
            n_images += images.shape[0]
            global_step += 1
            if progress is not None and len(per_batch) > 1:
                # previous batch's scalars: complete, so the fetch is free
                # (rendering batch 1 would block on the just-enqueued step,
                # i.e. the epoch-1 compile); label with the completed index.
                progress.update(len(per_batch) - 1,
                                n_images - images.shape[0], per_batch[-2])
            if cfg.verbose and cfg.log_every and \
                    len(per_batch) % cfg.log_every == 0:
                nb = len(per_batch)
                live = jax.device_get(per_batch[-1])
                print(f"  epoch {epoch + 1} batch {nb}: "
                      f"loss {float(live['loss']):.4f} "
                      f"dice {float(live['dice']):.4f} "
                      f"iou {float(live['iou']):.4f}")
        if progress is not None:
            progress.close()
        nb = len(per_batch)
        if nb:
            fetched = jax.device_get(per_batch)
            train_metrics = {k: float(np.mean([m[k] for m in fetched]))
                             for k in ("loss", "dice", "iou")}
        else:
            train_metrics = {k: float("nan") for k in ("loss", "dice", "iou")}
        test_metrics = evaluate(eval_step, state, test_loader, data_sharding)
        lr = scheduler.step(test_metrics["loss"])
        set_learning_rate(state, lr)

        history["train_loss"].append(train_metrics["loss"])
        history["train_dice"].append(train_metrics["dice"])
        history["train_iou"].append(train_metrics["iou"])
        history["test_loss"].append(test_metrics["loss"])
        history["test_dice"].append(test_metrics["dice"])
        history["test_iou"].append(test_metrics["iou"])
        history["learning_rates"].append(lr)
        if tb is not None:
            tb.log_epoch(epoch + 1, train_metrics, test_metrics, lr)

        dt = time.time() - t0
        if cfg.verbose:
            print(f"Epoch [{epoch + 1}/{cfg.num_epochs}]  "
                  f"({dt:.1f}s, {n_images / max(dt, 1e-9):.1f} img/s)")
            print(f"  Train - Loss: {train_metrics['loss']:.4f}, "
                  f"Dice: {train_metrics['dice']:.4f}, "
                  f"IoU: {train_metrics['iou']:.4f}")
            print(f"  Test  - Loss: {test_metrics['loss']:.4f}, "
                  f"Dice: {test_metrics['dice']:.4f}, "
                  f"IoU: {test_metrics['iou']:.4f}")
            print(f"  LR: {lr:.8f}")

        is_last = epoch + 1 == cfg.num_epochs
        due = cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0
        if cfg.checkpoint_manager is not None and (due or is_last):
            cfg.checkpoint_manager.save_epoch(
                epoch + 1, state, scheduler, history,
                test_dice=test_metrics["dice"], global_step=global_step)

    if tb is not None:
        tb.close()
    return state, history
