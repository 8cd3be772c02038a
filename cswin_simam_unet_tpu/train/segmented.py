"""Segmented training step: bounded-compile-memory execution for huge images.

The monolithic jitted train step compiles the WHOLE CSWin-UNet fwd+bwd as
one XLA program — at 2048^2 that graph exhausts the build environment's
compile service (OOM/SIGKILL, see BASELINE.md round-2 notes) before any
binary exists to run.  This module chains PER-SEGMENT jitted programs
instead: the forward runs ~10 small XLA programs handing a token/skip
carry between them, and the backward re-runs each segment under ``jax.vjp``
in reverse order (recompute-in-backward by construction, so activation
memory is also bounded by one segment).  No single program ever holds more
than one encoder/decoder stage, so both compile memory AND compile time
scale with the largest stage, not the whole model.

The mathematics is the monolithic step's exactly (same modules, same
parameter tree, same loss/metric formulas — tests/test_segmented.py pins
loss and gradient equality); only the dropout stream differs (keys fold in
a segment index rather than one whole-graph stream — a different, equally
valid sample).

Reference: the PyTorch reference has no equivalent — it cannot run 512^2
at all with its shipped splits (train_cswinunet_segmentation.py:204,
SURVEY.md §6), let alone 2048^2.

Segment map (param keys at the model root; carry keys):

    embed       embed_conv, embed_norm            x -> tokens
    enc{s}      stage{s}_*, merge{s}              tokens -> tokens, skip
    bottleneck  stage4_*, norm, stage_up4_*       tokens -> tokens
    dec{s}      upsample{s+1}, concat_linear{s+1},
                stage_up{s}_*                     tokens, skip -> tokens
    head        norm_up, upsample1, output        tokens -> logits
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from cswin_simam_unet_tpu.models.cswin import CSWinUNet
from cswin_simam_unet_tpu.models.layers import (
    CARAFE,
    CARAFEHead,
    CSWinBlock,
    FastDropout,
    FusedLayerNorm,
    MergeBlock,
    PointwiseConv,
    dense_init,
    scan_blocks,
)
from cswin_simam_unet_tpu.ops.simam import simam
from cswin_simam_unet_tpu.ops.windows import (
    nhwc_to_tokens,
    pixel_shuffle,
    pixel_unshuffle,
    tokens_to_nhwc,
)


def _dpr_schedule(model: CSWinUNet):
    depth = list(model.depth)
    total = int(np.sum(depth))
    dpr = [float(r) for r in np.linspace(0.0, model.drop_path_rate, total)]
    starts = np.concatenate([[0], np.cumsum(depth)]).astype(int)
    return depth, dpr, starts


def _run_stage(m: CSWinUNet, tokens, s: int, prefix: str, last: bool,
               deterministic: bool):
    """Blocks of one stage — module names/kwargs identical to
    ``CSWinUNet.__call__``'s ``run_stage`` so parameter subtrees are
    interchangeable.  Must be called from inside a segment's compact
    ``__call__`` (submodules bind to the calling scope)."""
    depth, dpr, starts = _dpr_schedule(m)
    reso = m.img_size // (4 * 2 ** s)
    if m.remat == "dots":
        Block = nn.remat(CSWinBlock, static_argnums=(2,),
                         policy=jax.checkpoint_policies.dots_saveable)
    elif m.remat:
        Block = nn.remat(CSWinBlock, static_argnums=(2,))
    else:
        Block = CSWinBlock
    if m.scan_stages and depth[s] > 1:
        dpr_s = jnp.asarray(dpr[starts[s]:starts[s] + depth[s]],
                            jnp.float32)
        tokens, _ = scan_blocks(
            depth[s], m._block_kw(s, reso, 0.0, last),
            deterministic, m.remat, f"{prefix}_scan")(tokens, dpr_s)
        return tokens
    for i in range(depth[s]):
        tokens = Block(
            name=f"{prefix}_{i}",
            **m._block_kw(s, reso, dpr[starts[s] + i], last),
        )(tokens, deterministic)
    return tokens


class _Embed(nn.Module):
    cfg: Any  # the CSWinUNet instance (hyperparameter source; never called)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        m = self.cfg
        img = nn.Conv(m.embed_dim, (7, 7), strides=(4, 4),
                      padding=((2, 2), (2, 2)), dtype=m.dtype,
                      name="embed_conv")(x)
        if m.use_simam:
            img = simam(img)
        tokens = nhwc_to_tokens(img)
        tokens = FusedLayerNorm(dtype=m.dtype, name="embed_norm")(tokens)
        return FastDropout(m.drop_rate)(tokens, deterministic)


class _Encoder(nn.Module):
    cfg: Any
    stage: int  # 0..2: blocks + merge; emits the skip

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        m = self.cfg
        s = self.stage
        reso = m.img_size // (4 * 2 ** s)
        tokens = _run_stage(m, tokens, s, f"stage{s + 1}", False,
                            deterministic)
        skip = tokens
        tokens = MergeBlock(m.embed_dim * 2 ** (s + 1),
                            use_simam=m.use_simam, use_pallas=m.use_pallas,
                            dtype=m.dtype, name=f"merge{s + 1}")(
            tokens, reso, reso)
        return tokens, skip


class _Bottleneck(nn.Module):
    cfg: Any  # stage4 + norm + stage_up4

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        m = self.cfg
        tokens = _run_stage(m, tokens, 3, "stage4", True, deterministic)
        tokens = FusedLayerNorm(dtype=m.dtype, name="norm")(tokens)
        return _run_stage(m, tokens, 3, "stage_up4", True, deterministic)


class _Decoder(nn.Module):
    cfg: Any
    stage: int  # 2,1,0: CARAFE up + skip concat + linear + blocks

    @nn.compact
    def __call__(self, tokens, skip, deterministic: bool = True):
        m = self.cfg
        s = self.stage
        dim = m.embed_dim * 2 ** s
        reso_in = m.img_size // (4 * 2 ** (s + 1))
        tokens = CARAFE(dim, up_factor=2, use_simam=m.use_simam,
                        use_pallas=m.use_pallas, dtype=m.dtype,
                        name=f"upsample{s + 2}")(tokens, reso_in, reso_in)
        tokens = jnp.concatenate([skip, tokens], axis=-1)
        tokens = nn.Dense(dim, kernel_init=dense_init, dtype=m.dtype,
                          name=f"concat_linear{s + 2}")(tokens)
        return _run_stage(m, tokens, s, f"stage_up{s + 1}", False,
                          deterministic)


class _Head(nn.Module):
    cfg: Any
    flat_logits: bool = False

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        m = self.cfg
        r0 = m.img_size // 4
        tokens = FusedLayerNorm(dtype=m.dtype, name="norm_up")(tokens)
        if m.use_pallas:
            y, enc, head_bias = CARAFE(m.embed_dim, up_factor=4,
                                       use_simam=m.use_simam,
                                       use_pallas=True, head_precursor=True,
                                       dtype=m.dtype, name="upsample1")(
                tokens, r0, r0)
            logits = CARAFEHead(m.num_classes, up_factor=4,
                                use_simam=m.use_simam, dtype=m.dtype,
                                name="output")(y, enc, head_bias)
            if self.flat_logits:
                return logits
            return pixel_shuffle(logits, 4)
        tokens = CARAFE(m.embed_dim, up_factor=4, use_simam=m.use_simam,
                        use_pallas=m.use_pallas, dtype=m.dtype,
                        name="upsample1")(tokens, r0, r0)
        img = tokens_to_nhwc(tokens, m.img_size, m.img_size)
        logits = PointwiseConv(m.num_classes, use_bias=False, dtype=m.dtype,
                               name="output")(img)
        if self.flat_logits:
            return pixel_unshuffle(logits, m.FLAT_HEAD_FACTOR)
        return logits


# which carry keys each segment's OUTPUT must contain (pass-through skips
# flow untouched; their cotangents chain for free through the vjp)
_LIVE_AFTER = {
    "embed": ("tokens",),
    "enc1": ("tokens", "skip0"),
    "enc2": ("tokens", "skip0", "skip1"),
    "enc3": ("tokens", "skip0", "skip1", "skip2"),
    "bottleneck": ("tokens", "skip0", "skip1", "skip2"),
    "dec3": ("tokens", "skip0", "skip1"),
    "dec2": ("tokens", "skip0"),
    "dec1": ("tokens",),
    "head": ("tokens",),
}


def build_segments(model: CSWinUNet, flat_logits: bool = False
                   ) -> List[Tuple[str, Callable]]:
    """Ordered (name, run) list; ``run(variables, carry, det, rngs)`` maps
    a carry dict to the next carry dict."""

    def as_run(name, module, in_keys, out_fn):
        def run(variables, carry, deterministic, rngs):
            args = [carry[k] for k in in_keys]
            out = module.apply(variables, *args,
                               deterministic=deterministic, rngs=rngs)
            new_carry = dict(carry)
            for k in in_keys:
                new_carry.pop(k, None)
            out_fn(new_carry, out)
            return {k: new_carry[k] for k in _LIVE_AFTER[name]}
        return name, run

    def set_tokens(c, out):
        c["tokens"] = out

    segs = [as_run("embed", _Embed(model), ["x"], set_tokens)]
    for s in range(3):
        def set_enc(c, out, s=s):
            c["tokens"], c[f"skip{s}"] = out
        segs.append(as_run(f"enc{s + 1}", _Encoder(model, s), ["tokens"],
                           set_enc))
    segs.append(as_run("bottleneck", _Bottleneck(model), ["tokens"],
                       set_tokens))
    for s in (2, 1, 0):
        segs.append(as_run(f"dec{s + 1}", _Decoder(model, s),
                           ["tokens", f"skip{s}"], set_tokens))
    segs.append(as_run("head", _Head(model, flat_logits=flat_logits),
                       ["tokens"], set_tokens))
    return segs


_PARAM_PREFIXES = {
    "embed": ("embed_conv", "embed_norm"),
    "enc1": ("stage1_", "merge1"),
    "enc2": ("stage2_", "merge2"),
    "enc3": ("stage3_", "merge3"),
    "bottleneck": ("stage4_", "norm", "stage_up4_"),
    "dec3": ("upsample4", "concat_linear4", "stage_up3_"),
    "dec2": ("upsample3", "concat_linear3", "stage_up2_"),
    "dec1": ("upsample2", "concat_linear2", "stage_up1_"),
    "head": ("norm_up", "upsample1", "output"),
}


def segment_param_keys(params: Dict, segments) -> List[List[str]]:
    """Partition the full param tree's root keys over the segments.

    Matches on the module-name prefixes above; exact names are claimed
    first-come (ordering keeps "norm" from swallowing "norm_up": claimed
    sets are disjoint and "norm_up" is an exact entry of its own segment,
    which is checked by the no-unassigned/no-double-claim asserts)."""
    out = []
    claimed = set()
    for name, _ in segments:
        pref = _PARAM_PREFIXES[name]
        keys = [k for k in params
                if k not in claimed
                and (k in pref or any(k.startswith(p) for p in pref
                                      if p.endswith("_")))]
        claimed.update(keys)
        out.append(sorted(keys))
    missing = set(params) - claimed
    if missing:
        raise ValueError(f"unassigned params: {sorted(missing)}")
    return out


def make_segmented_train_step(model: CSWinUNet, n_classes: int = 1,
                              donate_carries: bool = True,
                              donate_state: bool = True,
                              mesh=None) -> Callable:
    """(state, images_u8, masks_u8, rng) -> (state, metrics), as a chain of
    per-segment jitted programs (see module docstring).

    Matches ``make_train_step(model, n_classes, augment=None)`` math; no
    on-device augmentation (2048^2 memory-limited configs train without it
    or augment on host) and LayerNorm models (CSWin) only — no BatchNorm
    state threading.

    With ``mesh`` (a ``('data',)`` jax Mesh; VERDICT r03 #4) the chain runs
    data-parallel: the caller shards the batch over the mesh and replicates
    the state (``parallel.shard_state``), and every per-segment program is
    SPMD-partitioned by jit from its input shardings — carries stay
    batch-sharded through the whole chain, and each segment's parameter
    gradients are cross-device reduced by the partitioner inside that
    segment's vjp program (grads come out replicated, so ``update_jit``
    applies one identical update everywhere).  The only explicit treatment
    is the dropout keys, which must be replicated rather than committed to
    device 0.
    """
    from cswin_simam_unet_tpu.train.engine import (
        _batch_metrics,
        _finalize_targets,
        _flat_head,
        _prepare_batch,
    )
    from cswin_simam_unet_tpu.train.losses import segmentation_loss

    rep = None
    if mesh is not None:
        from cswin_simam_unet_tpu.parallel import replicated
        rep = replicated(mesh)

    flat = _flat_head(model, n_classes)
    segments = build_segments(model, flat_logits=flat)

    seg_fwd = []
    seg_bwd = []
    for name, run in segments:
        # deterministic=False: this is the TRAINING pass — dropout and
        # drop-path active, like the monolithic step's train=True
        def fwd(params, carry, key, _run=run):
            return _run({"params": params}, carry, False, {"dropout": key})

        def bwd(params, carry, key, g_out, _f=fwd):
            _, vjp_fn = jax.vjp(lambda p, c: _f(p, c, key), params, carry)
            gp, gc = vjp_fn(g_out)
            return gp, gc

        # Per-segment function names: the compile-cache key (and the remote
        # compile service's job-dedup hash) includes the jitted symbol name.
        # A generic shared name made every segment's program hash collide
        # with any earlier wedged/killed remote compile job for that
        # segment, which then hung all retries (observed 22 min on one
        # segment across three runs while the identical computation under a
        # fresh name compiled in 6 s).
        fwd.__name__ = f"seg_{name}_fwd"
        bwd.__name__ = f"seg_{name}_bwd"
        # fwd must NOT donate: the backward pass re-consumes each segment's
        # input carry.  bwd's carry + cotangent are each used exactly once.
        seg_fwd.append(jax.jit(fwd))
        seg_bwd.append(jax.jit(
            bwd, donate_argnums=(1, 3) if donate_carries else ()))

    def loss_and_glogits(logits, targets):
        def f(lg):
            return segmentation_loss(lg, targets, n_classes)
        loss, g = jax.value_and_grad(f)(logits)
        dice, iou = _batch_metrics(jax.lax.stop_gradient(logits), targets,
                                   n_classes)
        return loss, g, dice, iou

    loss_jit = jax.jit(loss_and_glogits)

    def prep(images_u8, masks_u8):
        images, masks = _prepare_batch(images_u8, masks_u8, n_classes)
        targets = _finalize_targets(masks, n_classes)
        if flat:
            targets = pixel_unshuffle(targets, model.FLAT_HEAD_FACTOR)
        return images, targets

    prep_jit = jax.jit(prep)
    # donate the old train state (default): without it the optimizer
    # update holds old AND new params+moments simultaneously — exactly the
    # HBM headroom this executor exists to preserve at 2048^2.  Callers
    # that re-use a state object across calls (tests) pass
    # donate_state=False, like the monolithic step's donate flag.
    update_jit = jax.jit(lambda state, grads:
                         state.apply_gradients(grads=grads),
                         donate_argnums=(0,) if donate_state else ())

    def eval_step(state, images_u8, masks_u8):
        """Forward-only chain (deterministic), same metric semantics as
        ``make_eval_step`` — the monolithic eval graph is compile-bounded
        at 2048^2 exactly like the train graph."""
        assert state.batch_stats is None
        images, targets = prep_jit(images_u8, masks_u8)
        part = _part_for(state.params)
        key = jax.random.PRNGKey(0)  # unused: deterministic forward
        if rep is not None:
            key = jax.device_put(key, rep)
        carry = {"x": images}
        for i, (name, run) in enumerate(segments):
            params_i = {k: state.params[k] for k in part[i]}
            carry = _eval_seg[i](params_i, carry, key)
        return loss_metrics_jit(carry["tokens"], targets)

    _eval_seg = []
    for name, run in segments:
        # deterministic=True: eval disables every stochastic layer
        def efwd(params, carry, key, _run=run):
            return _run({"params": params}, carry, True, {"dropout": key})
        efwd.__name__ = f"seg_{name}_eval"  # see the naming note above
        _eval_seg.append(jax.jit(efwd))

    def loss_metrics(logits, targets):
        loss = segmentation_loss(logits, targets, n_classes)
        dice, iou = _batch_metrics(logits, targets, n_classes)
        return {"loss": loss, "dice": dice, "iou": iou}

    loss_metrics_jit = jax.jit(loss_metrics)

    # host-overhead trims (the chain dispatches ~45 programs per step
    # through the tunnel — per-call Python must stay ahead of the device):
    # the param partition is a pure function of the KEY SET (stable across
    # steps), and the 10 per-segment dropout keys come from ONE jitted
    # program instead of 10 eager fold_in dispatches.
    part_cache: Dict[frozenset, List[List[str]]] = {}

    def _part_for(params):
        sig = frozenset(params)
        if sig not in part_cache:
            part_cache[sig] = segment_param_keys(params, segments)
        return part_cache[sig]

    def make_keys(rng):
        _, k_drop = jax.random.split(rng)
        return tuple(jax.random.fold_in(k_drop, i)
                     for i in range(len(segments)))

    make_keys_jit = jax.jit(make_keys,
                            out_shardings=(rep,) * len(segments)
                            if rep is not None else None)

    def step(state, images_u8, masks_u8, rng):
        assert state.batch_stats is None, \
            "segmented step supports LayerNorm models (CSWin) only"
        images, targets = prep_jit(images_u8, masks_u8)
        part = _part_for(state.params)
        keys = make_keys_jit(rng)

        # forward: keep each segment's INPUT carry for the backward pass
        carries = [{"x": images}]
        for i, f in enumerate(seg_fwd):
            params_i = {k: state.params[k] for k in part[i]}
            carries.append(f(params_i, carries[-1], keys[i]))

        logits = carries[-1]["tokens"]
        loss, g_logits, dice, iou = loss_jit(logits, targets)

        # backward: reverse vjp chain, one segment resident at a time
        g_carry = {"tokens": g_logits}
        grads: Dict[str, Any] = {}
        for i in reversed(range(len(segments))):
            params_i = {k: state.params[k] for k in part[i]}
            gp, g_carry = seg_bwd[i](params_i, carries[i], keys[i], g_carry)
            carries[i] = None  # donated
            grads.update(gp)

        state = update_jit(state, grads)
        return state, {"loss": loss, "dice": dice, "iou": iou}

    def cost_flops(state, images_u8, masks_u8, rng):
        """Summed XLA cost-analysis FLOPs of the chain's compiled programs
        (VERDICT r03 #3: the segmented path previously reported no MFU).

        ``useful``: prep + loss + optimizer + sum(seg_bwd) — each segment's
        vjp program computes its forward AND backward exactly once, so this
        sum is the standard fwd+bwd MFU numerator WITHOUT the chain's
        recompute overhead.  ``executed`` adds the forward chain (whose
        work the backward recomputes) — the flops the device actually runs.
        Lowering uses bare ShapeDtypeStructs (no data, no shardings): on a
        single device every program was already compiled by the warmup
        step so this costs cache hits only; under a DP mesh the SPMD
        programs have different HLO, so calling this would trigger fresh
        unsharded compiles — callers gate on single-device (bench.py
        does).

        NB: meaningless under ``scan_stages`` — XLA cost analysis counts a
        scan body once regardless of trip count (the round-2 scan-MFU
        undercount); callers must gate on ``not model.scan_stages``.
        """
        def sds(x):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), x)

        def flops_of(jf, *args):
            c = jf.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float((c or {}).get("flops", 0.0) or 0.0)

        part = segment_param_keys(state.params, segments)
        key_s = sds(jax.eval_shape(
            lambda r: jax.random.split(r)[1], rng))
        img_s, tgt_s = jax.eval_shape(prep, sds(images_u8), sds(masks_u8))
        useful = flops_of(prep_jit, sds(images_u8), sds(masks_u8))
        fwd_extra = 0.0
        carry = {"x": img_s}
        for i, (name, run) in enumerate(segments):
            params_s = {k: sds(state.params[k]) for k in part[i]}
            carry_next = jax.eval_shape(seg_fwd[i], params_s, carry, key_s)
            fwd_extra += flops_of(seg_fwd[i], params_s, carry, key_s)
            # cotangent of the segment output has the output's shapes
            useful += flops_of(seg_bwd[i], params_s, carry, key_s,
                               carry_next)
            carry = carry_next
        useful += flops_of(loss_jit, carry["tokens"], tgt_s)
        useful += flops_of(update_jit, sds(state), sds(state.params))
        return {"useful": useful, "executed": useful + fwd_extra}

    step.eval_step = eval_step
    step.cost_flops = cost_flops
    return step
