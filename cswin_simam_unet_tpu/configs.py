"""Dataclass configs + registry for every supported training configuration.

The reference hardcodes all hyperparameters inside ``main()``
(train_unet_segmentation.py:406-423, train_cswinunet_segmentation.py:846-862);
here each BASELINE.json config row is a named, constructible config whose
defaults equal the reference's constants:

UNet:  448^2, batch 4, Adam lr 1e-3, wd 1e-4, 100 epochs, BCE,
       plateau(0.5, 5, 1e-7), seed 42, split 0.2.
CSWin: 448^2, batch 2, AdamW lr 1e-4, wd 1e-4, drop/attn/path 0.3,
       100 epochs, same scheduler/seed/split.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

from cswin_simam_unet_tpu.data.augment import AugmentConfig
from cswin_simam_unet_tpu.models import CSWinUNet, UNet


@dataclass
class ModelConfig:
    family: str = "unet"  # 'unet' | 'cswin'
    n_classes: int = 1
    in_channels: int = 3
    use_simam: bool = False
    use_pallas: bool = False
    # cswin-only
    embed_dim: int = 64
    depth: Tuple[int, ...] = (1, 2, 9, 1)
    split_size: Tuple[int, ...] = (1, 2, 7, 7)
    num_heads: Tuple[int, ...] = (2, 4, 8, 16)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    # backward remat per block: False (fastest at <=1024^2), True (whole
    # block recomputes — most memory-frugal), or 'dots' (dots_saveable
    # policy).  Measured trade-offs in BASELINE.md.
    remat: object = False
    # lax.scan over multi-block stages (stacked params, one traced block per
    # stage) — identical deterministic outputs, much cheaper cold compiles
    # (see models/scan_params.py for checkpoint-layout conversion)
    scan_stages: bool = False
    dtype: str = "float32"  # 'float32' | 'bfloat16' compute dtype


@dataclass
class TrainRunConfig:
    name: str = "unet"
    model: ModelConfig = field(default_factory=ModelConfig)
    image_size: int = 448
    batch_size: int = 4
    num_epochs: int = 100
    optimizer: str = "adam"
    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    plateau_factor: float = 0.5
    plateau_patience: int = 5
    plateau_min_lr: float = 1e-7
    test_split: float = 0.2
    seed: int = 42
    augment: Optional[AugmentConfig] = field(default_factory=AugmentConfig)
    num_workers: int = 4
    # gradient-accumulation micro-batches per optimizer step (1 = off);
    # exact full-batch loss/metric semantics — see train.engine
    grad_accum: int = 1
    # per-stage jitted programs (train/segmented.py): bounded compile
    # memory/time for 2048^2-class images; composes with augment,
    # grad_accum and data_parallel (round 5)
    segmented: bool = False
    # with segmented: chunk unscanned stages deeper than N blocks into
    # <=N-block segments (finer residual grains for the auto save/
    # recompute policy — train/segmented.py; 0 = one segment per stage)
    seg_depth_split: int = 0
    # parallelism
    data_parallel: bool = True  # shard batch over all local devices
    checkpoint_dir: Optional[str] = None
    output_prefix: str = "unet"


def build_model(cfg: ModelConfig, image_size: int):
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[cfg.dtype]
    if cfg.family == "unet":
        return UNet(n_channels=cfg.in_channels, n_classes=cfg.n_classes,
                    use_simam=cfg.use_simam, dtype=dtype)
    if cfg.family == "cswin":
        return CSWinUNet(
            img_size=image_size, in_chans=cfg.in_channels,
            num_classes=cfg.n_classes, embed_dim=cfg.embed_dim,
            depth=cfg.depth, split_size=cfg.split_size,
            num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
            qkv_bias=cfg.qkv_bias, drop_rate=cfg.drop_rate,
            attn_drop_rate=cfg.attn_drop_rate,
            drop_path_rate=cfg.drop_path_rate, use_simam=cfg.use_simam,
            use_pallas=cfg.use_pallas, remat=cfg.remat,
            scan_stages=cfg.scan_stages, dtype=dtype)
    raise ValueError(f"unknown model family: {cfg.family}")


def _cswin_model(**kw) -> ModelConfig:
    return ModelConfig(family="cswin", drop_rate=0.3, attn_drop_rate=0.3,
                       drop_path_rate=0.3, **kw)


# The five BASELINE.json configs + the two reference-default runs.
CONFIGS = {
    # reference defaults (ref main() constants)
    "unet": TrainRunConfig(name="unet"),
    "cswinunet": TrainRunConfig(
        name="cswinunet", model=_cswin_model(), batch_size=2,
        optimizer="adamw", learning_rate=1e-4, output_prefix="cswinunet"),
    # BASELINE.json config 1: vanilla UNet, binary, 256^2, batch 2
    "unet_256": TrainRunConfig(
        name="unet_256", image_size=256, batch_size=2,
        output_prefix="unet_256"),
    # config 2: UNet + SimAM encoder attention, 256^2, batch 4
    "unet_simam_256": TrainRunConfig(
        name="unet_simam_256", model=ModelConfig(use_simam=True),
        image_size=256, batch_size=4, output_prefix="unet_simam_256"),
    # config 3: CSWin-UNet tiny (2-stage-style: shallow depths, stripe 1/2), 224^2
    "cswin_tiny_224": TrainRunConfig(
        name="cswin_tiny_224",
        model=_cswin_model(embed_dim=32, depth=(1, 2, 2, 1),
                           split_size=(1, 2, 2, 7), num_heads=(2, 2, 4, 8)),
        image_size=224, batch_size=2, optimizer="adamw", learning_rate=1e-4,
        output_prefix="cswin_tiny_224"),
    # config 4: full CSWin-SimAM-UNet, 224^2, batch 8, on-device augmentation
    "cswin_simam_224": TrainRunConfig(
        name="cswin_simam_224", model=_cswin_model(use_simam=True),
        image_size=224, batch_size=8, optimizer="adamw", learning_rate=1e-4,
        output_prefix="cswin_simam_224"),
    # config 5: full CSWin-SimAM-UNet multi-class at 512^2, data-parallel v5e-8
    # (512^2 requires split [1,2,8,8]; the reference default [1,2,7,7]
    #  cannot run 512^2 — SURVEY.md §6)
    "cswin_simam_512_dp": TrainRunConfig(
        name="cswin_simam_512_dp",
        model=_cswin_model(use_simam=True, n_classes=4,
                           split_size=(1, 2, 8, 8)),
        image_size=512, batch_size=16, optimizer="adamw", learning_rate=1e-4,
        data_parallel=True, output_prefix="cswin_simam_512_dp"),
    # long-context extension (no reference equivalent — its default config
    # cannot even run 512², SURVEY.md §6): 1024² on one chip via the
    # O(stripe)-memory attention kernels; scan_stages keeps the cold compile
    # tractable and grad_accum=2 gives the 448²-config's effective batch
    # from batch-1 micro-steps.  Measured 29.9 img/s/chip unrolled at
    # batch 2 (BASELINE.md "Scaling headroom").
    "cswin_simam_1024": TrainRunConfig(
        name="cswin_simam_1024",
        model=_cswin_model(use_simam=True, split_size=(1, 2, 8, 8),
                           scan_stages=True, dtype="bfloat16",
                           use_pallas=True),
        image_size=1024, batch_size=2, grad_accum=2, optimizer="adamw",
        learning_rate=1e-4, output_prefix="cswin_simam_1024"),
    # 2048^2 long-context config: the monolithic graph exhausts the XLA
    # compile service (BASELINE.md), so this trains via the segmented
    # per-stage step — WITH the reference's augmentation pipeline fused
    # into the jitted prep program (round 5; VERDICT r04 #5).  All attention runs fused Pallas kernels: stripe
    # windows on the v2 whole-window kernels, the stage-4 global window
    # (4096 tokens) on the flash (KV-tiled online-softmax) kernel — the
    # round-3 XLA fallback for >2048-token windows is gone.  Unrolled
    # blocks (not scan_stages): per-segment programs compile fine unrolled
    # and run 1.6x faster (245.7 ms vs 396.5 ms/step, training config,
    # BASELINE.md round 4).
    "cswin_simam_2048": TrainRunConfig(
        name="cswin_simam_2048",
        model=_cswin_model(use_simam=True, split_size=(1, 2, 8, 8),
                           dtype="bfloat16", use_pallas=True),
        image_size=2048, batch_size=1, optimizer="adamw",
        segmented=True, seg_depth_split=3, data_parallel=False,
        learning_rate=1e-4, output_prefix="cswin_simam_2048"),
    # data-parallel variant (VERDICT r03 #4): the segmented chain runs
    # SPMD over a ('data',) mesh — batch sharded, per-segment grads
    # cross-device reduced inside each segment's vjp program
    # (tests/test_segmented.py::test_segmented_data_parallel_...).
    "cswin_simam_2048_dp": TrainRunConfig(
        name="cswin_simam_2048_dp",
        model=_cswin_model(use_simam=True, split_size=(1, 2, 8, 8),
                           dtype="bfloat16", use_pallas=True),
        image_size=2048, batch_size=8, optimizer="adamw",
        segmented=True, seg_depth_split=3, data_parallel=True,
        learning_rate=1e-4, output_prefix="cswin_simam_2048_dp"),
}


def get_config(name: str, **overrides) -> TrainRunConfig:
    if name not in CONFIGS:
        raise KeyError(f"unknown config '{name}'; available: {sorted(CONFIGS)}")
    cfg = dataclasses.replace(CONFIGS[name])
    model_overrides = {k[6:]: v for k, v in overrides.items()
                       if k.startswith("model_")}
    run_overrides = {k: v for k, v in overrides.items()
                     if not k.startswith("model_")}
    if model_overrides:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, **model_overrides))
    if run_overrides:
        cfg = dataclasses.replace(cfg, **run_overrides)
    return cfg
