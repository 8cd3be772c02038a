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
               deterministic: bool, lo: int = 0, hi: int | None = None):
    """Blocks [lo, hi) of one stage (defaults: the whole stage) — module
    names/kwargs identical to ``CSWinUNet.__call__``'s ``run_stage`` so
    parameter subtrees are interchangeable.  Must be called from inside a
    segment's compact ``__call__`` (submodules bind to the calling scope).
    The scan path only applies to whole stages (stacked params cannot be
    chunked); ``build_segments`` never chunks a scanned stage."""
    depth, dpr, starts = _dpr_schedule(m)
    hi = depth[s] if hi is None else hi
    reso = m.img_size // (4 * 2 ** s)
    if m.remat == "dots":
        Block = nn.remat(CSWinBlock, static_argnums=(2,),
                         policy=jax.checkpoint_policies.dots_saveable)
    elif m.remat:
        Block = nn.remat(CSWinBlock, static_argnums=(2,))
    else:
        Block = CSWinBlock
    from cswin_simam_unet_tpu.models.cswin import scan_min_depth
    msd = scan_min_depth(m.scan_stages)
    if msd is not None and depth[s] >= msd and lo == 0 and hi == depth[s]:
        dpr_s = jnp.asarray(dpr[starts[s]:starts[s] + depth[s]],
                            jnp.float32)
        tokens, _ = scan_blocks(
            depth[s], m._block_kw(s, reso, 0.0, last),
            deterministic, m.remat, f"{prefix}_scan",
            unroll=m.scan_unroll)(tokens, dpr_s)
        return tokens
    for i in range(lo, hi):
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
    lo: int = 0          # chunking (depth_split): block range [lo, hi)
    hi: int | None = None
    tail: bool = True    # final chunk: emit the skip + run the merge

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        m = self.cfg
        s = self.stage
        reso = m.img_size // (4 * 2 ** s)
        tokens = _run_stage(m, tokens, s, f"stage{s + 1}", False,
                            deterministic, self.lo, self.hi)
        if not self.tail:
            return tokens
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
    lo: int = 0          # chunking (depth_split): block range [lo, hi)
    hi: int | None = None
    head: bool = True    # first chunk: CARAFE up + skip concat + linear

    @nn.compact
    def __call__(self, tokens, skip=None, deterministic: bool = True):
        m = self.cfg
        s = self.stage
        if self.head:
            dim = m.embed_dim * 2 ** s
            reso_in = m.img_size // (4 * 2 ** (s + 1))
            tokens = CARAFE(dim, up_factor=2, use_simam=m.use_simam,
                            use_pallas=m.use_pallas, dtype=m.dtype,
                            name=f"upsample{s + 2}")(tokens, reso_in,
                                                     reso_in)
            tokens = jnp.concatenate([skip, tokens], axis=-1)
            tokens = nn.Dense(dim, kernel_init=dense_init, dtype=m.dtype,
                              name=f"concat_linear{s + 2}")(tokens)
        return _run_stage(m, tokens, s, f"stage_up{s + 1}", False,
                          deterministic, self.lo, self.hi)


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


# Per-segment carry signatures.  Skips are NOT threaded through
# intermediate segments: each segment's carry holds exactly what it
# consumes/produces, and the step() wiring routes skip tensors (and their
# cotangents) directly from producer to consumer at the Python level —
# round-4 VERDICT #3's "route pass-through skips around segments": the old
# pass-through carries made every intermediate program copy each live skip
# in (input buffers cannot alias outputs without donation) and back out,
# both directions.
_SEG_IO = {
    "embed": (("x",), ("tokens",)),
    "enc1": (("tokens",), ("tokens", "skip0")),
    "enc2": (("tokens",), ("tokens", "skip1")),
    "enc3": (("tokens",), ("tokens", "skip2")),
    "bottleneck": (("tokens",), ("tokens",)),
    "dec3": (("tokens", "skip2"), ("tokens",)),
    "dec2": (("tokens", "skip1"), ("tokens",)),
    "dec1": (("tokens", "skip0"), ("tokens",)),
    "head": (("tokens",), ("tokens",)),
}


def build_segments(model: CSWinUNet, flat_logits: bool = False,
                   depth_split: int = 0) -> List[Tuple[str, Callable]]:
    """Ordered (name, run) list; ``run(variables, carry, det, rngs)`` maps
    a carry dict (exactly ``_SEG_IO[name][0]``) to the output carry dict
    (exactly ``_SEG_IO[name][1]``).

    ``depth_split > 0`` chunks every unscanned encoder/decoder stage deeper
    than that into segments of at most ``depth_split`` blocks (names
    ``enc3x0, enc3x1, ...``) — finer grains for the residual-saving "auto"
    policy to pack against the HBM budget (round-5: at 2048^2 the 9-block
    stage-3 twins are each ~3.5 GB of residuals as one segment, forcing
    whole-stage recompute; as 3-block chunks most of them fit).  Chunk IO
    and param ownership are registered in ``_SEG_IO``/``_PARAM_PREFIXES``
    (idempotent — names are deterministic functions of the geometry)."""

    def as_run(name, module, out_fn):
        in_keys = _SEG_IO[name][0]

        def run(variables, carry, deterministic, rngs):
            args = [carry[k] for k in in_keys]
            out = module.apply(variables, *args,
                               deterministic=deterministic, rngs=rngs)
            new_carry: Dict[str, Any] = {}
            out_fn(new_carry, out)
            return new_carry
        return name, run

    def set_tokens(c, out):
        c["tokens"] = out

    from cswin_simam_unet_tpu.models.cswin import scan_min_depth
    msd = scan_min_depth(model.scan_stages)

    def chunks(depth):
        """[(lo, hi)] block ranges for one stage (1 entry = unchunked)."""
        scanned = msd is not None and depth >= msd
        if not depth_split or scanned or depth <= depth_split:
            return [(0, depth)]
        bounds = list(range(0, depth, depth_split)) + [depth]
        return list(zip(bounds[:-1], bounds[1:]))

    segs = [as_run("embed", _Embed(model), set_tokens)]
    for s in range(3):
        def set_enc(c, out, s=s):
            c["tokens"], c[f"skip{s}"] = out
        ck = chunks(model.depth[s])
        if len(ck) == 1:
            # static _SEG_IO/_PARAM_PREFIXES entries (prefix-matched, so
            # the scan-stages "stage{s}_scan" param key is covered too)
            segs.append(as_run(f"enc{s + 1}", _Encoder(model, s), set_enc))
            continue
        for j, (lo, hi) in enumerate(ck):
            final = hi == model.depth[s]
            name = f"enc{s + 1}x{j}"
            blocks = tuple(f"stage{s + 1}_{i}" for i in range(lo, hi))
            _SEG_IO[name] = ((("tokens",), ("tokens", f"skip{s}"))
                             if final else (("tokens",), ("tokens",)))
            _PARAM_PREFIXES[name] = (
                blocks + (f"merge{s + 1}",) if final else blocks)
            segs.append(as_run(
                name, _Encoder(model, s, lo=lo, hi=hi, tail=final),
                set_enc if final else set_tokens))
    segs.append(as_run("bottleneck", _Bottleneck(model), set_tokens))
    for s in (2, 1, 0):
        ck = chunks(model.depth[s])
        if len(ck) == 1:
            segs.append(as_run(f"dec{s + 1}", _Decoder(model, s),
                               set_tokens))
            continue
        for j, (lo, hi) in enumerate(ck):
            head_c = lo == 0
            name = f"dec{s + 1}x{j}"
            blocks = tuple(f"stage_up{s + 1}_{i}" for i in range(lo, hi))
            _SEG_IO[name] = ((("tokens", f"skip{s}"), ("tokens",))
                             if head_c else (("tokens",), ("tokens",)))
            _PARAM_PREFIXES[name] = (
                (f"upsample{s + 2}", f"concat_linear{s + 2}") + blocks
                if head_c else blocks)
            segs.append(as_run(
                name, _Decoder(model, s, lo=lo, hi=hi, head=head_c),
                set_tokens))
    segs.append(as_run("head", _Head(model, flat_logits=flat_logits),
                       set_tokens))
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
                              mesh=None, augment=None, grad_accum: int = 1,
                              save_residuals="auto",
                              residual_budget_bytes=None,
                              depth_split: int = 0) -> Callable:
    """(state, images_u8, masks_u8, rng) -> (state, metrics), as a chain of
    per-segment jitted programs (see module docstring).

    Matches ``make_train_step(model, n_classes, augment, grad_accum)``
    math for LayerNorm models (CSWin) — no BatchNorm state threading.
    Round-5 additions (VERDICT r04 #3/#5):

    * ``save_residuals`` — PER-SEGMENT residual policy:
      - ``True``: every segment's forward program also emits its vjp
        residuals (the flattened ``jax.vjp`` closure) and the backward
        replays ONLY the backward from them — no forward recompute
        (cost_flops: executed == useful).  Costs the residual memory of
        the whole net between fwd and bwd — measured NOT to fit v5e HBM
        at 2048^2 batch 1 (RESOURCE_EXHAUSTED; the activations of the
        monolithic no-remat graph fit because XLA frees them as the
        backward walks, but the chain holds every segment's residuals
        simultaneously at the loss point).
      - ``False``: recompute-in-backward everywhere — O(one-segment)
        activation memory, ~32% executed-FLOPs tax (round-3/4 mode).
      - a set/list of segment names: save exactly those, recompute the
        rest (mixed mode).
      - ``"auto"`` (default): resolved on the first step from the real
        shapes — per-segment residual sizes come from ``jax.eval_shape``
        over the residual-saving forwards, and the largest segments are
        demoted to recompute mode until the total fits the device budget
        (``residual_budget_bytes`` or ~70% of the device's HBM minus
        ~5x the parameter bytes for state/grads/workspace).  At 512^2
        batch 8 everything saves; at 2048^2 batch 1 the deep stage-3
        twins (and whatever else exceeds the budget) recompute.
    * ``depth_split``: chunk unscanned stages deeper than this many blocks
      into segments of at most that size (see ``build_segments``) — finer
      residual grains for "auto" to pack against the HBM budget.  0 = one
      segment per stage (the round-3/4 layout).
    * ``augment``: the reference's paired augmentation pipeline
      (data/augment.py) fused into the jitted prep program — train-only,
      exactly like the monolithic step.
    * ``grad_accum=A``: A equal micro-batches per optimizer step (batch
      divisible by A), gradients averaged on device, metrics reduced from
      raw sums so they equal the full batch's.
    * skips are routed AROUND segments (``_SEG_IO``): no pass-through
      copies, and skip cotangents jump straight from the consuming decoder
      segment's vjp to the producing encoder segment's.

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
    from cswin_simam_unet_tpu.data.augment import augment_batch
    from cswin_simam_unet_tpu.train.engine import (
        _finalize_targets,
        _flat_head,
        _metric_sums,
        _metrics_from_sums,
        _prepare_batch,
    )
    from cswin_simam_unet_tpu.train.losses import segmentation_loss

    rep = None
    n_dev = 1
    if mesh is not None:
        from cswin_simam_unet_tpu.parallel import replicated
        rep = replicated(mesh)
        n_dev = mesh.size

    # ADVICE r04: under a DP mesh, a use_pallas model's custom calls have
    # no GSPMD partitioning rule — the partitioner may silently force
    # replication (or fail on hardware).  Route the per-segment programs
    # through shard_map instead: each shard traces the LOCAL batch shapes,
    # so every Pallas grid is explicitly per-shard, and parameter grads
    # are psum'd inside the mapped body.  XLA-path models keep plain
    # GSPMD partitioning (proven by the DP equality tests).  shard_map
    # differentiates per-shard, so the residual-saving fwd is replaced by
    # the recompute-mode vjp pairing there.
    use_shard_map = mesh is not None and bool(
        getattr(model, "use_pallas", False))
    if use_shard_map:
        save_residuals = False

    accum = int(grad_accum)
    if accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    flat = _flat_head(model, n_classes)
    segments = build_segments(model, flat_logits=flat,
                              depth_split=depth_split)
    seg_names = [n for n, _ in segments]
    n_seg = len(segments)

    # Per-segment residual policy (module docstring): res_mode[i] is True
    # when segment i saves residuals, False when it recomputes.  "auto"
    # stays None until the first call resolves it from concrete shapes.
    if save_residuals == "auto":
        res_mode: List[bool] | None = None
    elif isinstance(save_residuals, bool):
        res_mode = [save_residuals] * n_seg
    elif isinstance(save_residuals, (set, frozenset, list, tuple)):
        unknown = set(save_residuals) - set(seg_names)
        if unknown:
            raise ValueError(f"save_residuals names not segments: "
                             f"{sorted(unknown)} (have {seg_names})")
        res_mode = [n in set(save_residuals) for n in seg_names]
    else:
        raise ValueError(f"save_residuals: bool, 'auto', or a collection "
                         f"of segment names (got {save_residuals!r})")

    # Per-segment function names: the compile-cache key (and the remote
    # compile service's job-dedup hash) includes the jitted symbol name.
    # A generic shared name made every segment's program hash collide
    # with any earlier wedged/killed remote compile job for that
    # segment, which then hung all retries (observed 22 min on one
    # segment across three runs while the identical computation under a
    # fresh name compiled in 6 s).
    # Both execution variants are built for every segment (jit is lazy —
    # nothing compiles until a mode actually runs); ``res_mode`` picks per
    # segment at call time.  shard_map builds the recompute pair only.
    seg_fwd_save: List[Any] = []
    seg_bwd_save: List[Any] = []
    seg_fwd_rec: List[Any] = []
    seg_bwd_rec: List[Any] = []
    _res_tree: Dict[str, Any] = {}  # vjp-closure treedefs, set at trace time
    _res_fns: List[Callable] = []   # unjitted fwd_r's, for eval_shape sizing
    for name, run in segments:
        # deterministic=False: this is the TRAINING pass — dropout and
        # drop-path active, like the monolithic step's train=True
        def fwd(params, carry, key, _run=run):
            return _run({"params": params}, carry, False, {"dropout": key})

        if not use_shard_map:
            def fwd_r(params, carry, key, _f=fwd, _name=name):
                out, vjp_fn = jax.vjp(lambda p, c: _f(p, c, key),
                                      params, carry)
                flat_res, treedef = jax.tree.flatten(vjp_fn)
                _res_tree[_name] = treedef  # trace-time side channel
                return out, tuple(flat_res)

            def bwd_r(res, g_out, _name=name):
                vjp_fn = jax.tree.unflatten(_res_tree[_name], list(res))
                return vjp_fn(g_out)

            fwd_r.__name__ = f"seg_{name}_fwdres"
            bwd_r.__name__ = f"seg_{name}_bwdres"
            # embed's carry is the caller's images batch — never donate it
            # (callers reuse the same buffers across steps); every other
            # carry is chain-internal and dead after its segment consumes
            # it, and the residuals + cotangents die inside bwd.
            fdon = (1,) if (donate_carries and name != "embed") else ()
            _res_fns.append(fwd_r)
            seg_fwd_save.append(jax.jit(fwd_r, donate_argnums=fdon))
            seg_bwd_save.append(jax.jit(
                bwd_r, donate_argnums=(0, 1) if donate_carries else ()))
        else:
            _res_fns.append(None)
            seg_fwd_save.append(None)
            seg_bwd_save.append(None)

        def bwd(params, carry, key, g_out, _f=fwd):
            _, vjp_fn = jax.vjp(lambda p, c: _f(p, c, key), params,
                                carry)
            gp, gc = vjp_fn(g_out)
            return gp, gc

        fwd.__name__ = f"seg_{name}_fwd"
        bwd.__name__ = f"seg_{name}_bwd"
        if use_shard_map:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def bspec(k):
                return P("data", None, None, None) if k == "x" \
                    else P("data", None, None)

            in_keys, out_keys = _SEG_IO[name]
            cin_spec = {k: bspec(k) for k in in_keys}
            cout_spec = {k: bspec(k) for k in out_keys}

            def fwd_sm(params, carry, key, _f=fwd, _ci=cin_spec,
                       _co=cout_spec):
                return shard_map(
                    _f, mesh=mesh, in_specs=(P(), _ci, P()),
                    out_specs=_co, check_vma=False)(params, carry, key)

            def bwd_sm(params, carry, key, g_out, _f=fwd,
                       _ci=cin_spec, _co=cout_spec):
                def local(p, c, k, g):
                    _, vjp_fn = jax.vjp(
                        lambda pp, cc: _f(pp, cc, k), p, c)
                    gp, gc = vjp_fn(g)
                    # local grads sum the shard's samples; the global
                    # gradient is their cross-shard sum, replicated
                    gp = jax.tree.map(
                        lambda x: jax.lax.psum(x, "data"), gp)
                    return gp, gc
                return shard_map(
                    local, mesh=mesh,
                    in_specs=(P(), _ci, P(), _co),
                    out_specs=(P(), _ci), check_vma=False)(
                    params, carry, key, g_out)

            fwd_sm.__name__ = f"seg_{name}_fwdsm"
            bwd_sm.__name__ = f"seg_{name}_bwdsm"
            seg_fwd_rec.append(jax.jit(fwd_sm))
            seg_bwd_rec.append(jax.jit(
                bwd_sm, donate_argnums=(1, 3) if donate_carries else ()))
        else:
            # fwd must NOT donate: the backward pass re-consumes each
            # segment's input carry.  bwd's carry + cotangent are each
            # used exactly once.
            seg_fwd_rec.append(jax.jit(fwd))
            seg_bwd_rec.append(jax.jit(
                bwd, donate_argnums=(1, 3) if donate_carries else ()))

    def _resolve_res_mode(params, part, images, seg_key):
        """The "auto" policy: size every segment's residuals abstractly
        (zero FLOPs — ``jax.eval_shape`` over the residual-saving
        forwards), then demote the largest segments to recompute until
        the total fits the budget.  Returns the per-segment policy.
        ``images``/``seg_key`` may be concrete arrays or shape structs."""
        budget = residual_budget_bytes
        if budget is None:
            try:
                stats = jax.devices()[0].memory_stats() or {}
                hbm = int(stats.get("bytes_limit", 0)) or 16 * 1024 ** 3
            except Exception:
                hbm = 16 * 1024 ** 3
            p_bytes = sum(a.size * a.dtype.itemsize
                          for a in jax.tree.leaves(params))
            # ~70% of HBM, minus ~5x params (f32 master + adamw moments +
            # grads + update temporaries); carries/workspace live in the
            # remaining 30%
            budget = int(0.7 * hbm) - 5 * p_bytes
        struct = lambda t: jax.tree.map(  # noqa: E731
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), t)
        key_s = struct(seg_key)
        sizes = []
        cur = {"x": struct(images)}
        skips: Dict[str, Any] = {}
        for i, name in enumerate(seg_names):
            in_keys, out_keys = _SEG_IO[name]
            cin = {k: (cur.pop(k) if k in cur else skips.pop(k))
                   for k in in_keys}
            params_i = struct({k: params[k] for k in part[i]})
            out, res = jax.eval_shape(_res_fns[i], params_i, cin, key_s)
            sizes.append(sum(a.size * a.dtype.itemsize
                             for a in jax.tree.leaves(res)))
            cur = dict(out)
            for k in out_keys:
                if k.startswith("skip"):
                    skips[k] = cur.pop(k)
        mode = [True] * n_seg
        total = sum(sizes)
        for i in sorted(range(n_seg), key=lambda i: -sizes[i]):
            if total <= budget:
                break
            mode[i] = False
            total -= sizes[i]
        import sys as _sys
        print(f"segmented: auto residual policy — save "
              f"{[n for n, m in zip(seg_names, mode) if m]}, recompute "
              f"{[n for n, m in zip(seg_names, mode) if not m]} "
              f"(residuals {sum(sizes) / 1e9:.2f} GB total, "
              f"{total / 1e9:.2f} GB kept, budget {budget / 1e9:.2f} GB)",
              file=_sys.stderr)
        return mode

    def loss_and_glogits(logits, targets):
        def f(lg):
            return segmentation_loss(lg, targets, n_classes)
        loss, g = jax.value_and_grad(f)(logits)
        msums = _metric_sums(jax.lax.stop_gradient(logits), targets,
                             n_classes)
        return loss, g, msums

    loss_jit = jax.jit(loss_and_glogits)

    def prep(images_u8, masks_u8, k_aug):
        images, masks = _prepare_batch(images_u8, masks_u8, n_classes)
        if augment is not None:
            images, masks = augment_batch(k_aug, images, masks, augment)
        targets = _finalize_targets(masks, n_classes)
        if flat:
            targets = pixel_unshuffle(targets, model.FLAT_HEAD_FACTOR)
        return images, targets

    prep_jit = jax.jit(prep)

    def prep_eval(images_u8, masks_u8):
        images, masks = _prepare_batch(images_u8, masks_u8, n_classes)
        targets = _finalize_targets(masks, n_classes)
        if flat:
            targets = pixel_unshuffle(targets, model.FLAT_HEAD_FACTOR)
        return images, targets

    prep_eval_jit = jax.jit(prep_eval)

    # donate the old train state (default): without it the optimizer
    # update holds old AND new params+moments simultaneously — exactly the
    # HBM headroom this executor exists to preserve at 2048^2.  Callers
    # that re-use a state object across calls (tests) pass
    # donate_state=False, like the monolithic step's donate flag.
    update_jit = jax.jit(lambda state, grads:
                         state.apply_gradients(grads=grads),
                         donate_argnums=(0,) if donate_state else ())

    # grad-accum combiners: running (grads, loss_sum, metric_sums) triple,
    # accumulator donated each micro-step
    acc_add_jit = jax.jit(lambda a, b: jax.tree.map(jnp.add, a, b),
                          donate_argnums=(0,))
    acc_scale_jit = jax.jit(
        lambda g: jax.tree.map(lambda x: x / accum, g),
        donate_argnums=(0,))

    # host-overhead trims (the chain dispatches ~45 programs per step
    # through the tunnel — per-call Python must stay ahead of the device):
    # the param partition is a pure function of the KEY SET (stable across
    # steps), and all per-segment/per-micro dropout keys come from ONE
    # jitted program instead of eager fold_in dispatches.
    part_cache: Dict[frozenset, List[List[str]]] = {}

    def _part_for(params):
        sig = frozenset(params)
        if sig not in part_cache:
            part_cache[sig] = segment_param_keys(params, segments)
        return part_cache[sig]

    def make_keys(rng):
        k_aug, k_drop = jax.random.split(rng)
        segk = tuple(jax.random.fold_in(k_drop, i) for i in range(n_seg))
        if accum == 1:
            return (k_aug,) + segk
        # per-micro streams: fold each segment key (and the augment key)
        # by the micro index — mirrors the monolithic grad-accum step's
        # per-micro fold_in (train/engine.py)
        out = tuple(jax.random.fold_in(k_aug, a) for a in range(accum))
        out += tuple(jax.random.fold_in(k, a)
                     for a in range(accum) for k in segk)
        return out

    n_keys = accum + accum * n_seg if accum > 1 else 1 + n_seg
    make_keys_jit = jax.jit(make_keys,
                            out_shardings=(rep,) * n_keys
                            if rep is not None else None)

    def run_chain(params, part, images, targets, seg_keys, collect=None):
        """One fwd+bwd pass over the chain for one (micro-)batch.

        ``collect``: optional dict that receives the per-program concrete
        argument snapshots cost_flops needs (shape/dtype/sharding structs).
        Returns (grads, loss, metric_sums).
        """
        def snap(tree):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding), tree)

        cur: Dict[str, Any] = {"x": images}
        skips: Dict[str, Any] = {}
        inputs: List[Any] = []
        residuals: List[Any] = []
        for i, name in enumerate(seg_names):
            in_keys, out_keys = _SEG_IO[name]
            cin = {k: (cur.pop(k) if k in cur else skips.pop(k))
                   for k in in_keys}
            params_i = {k: params[k] for k in part[i]}
            if collect is not None:
                collect.setdefault("fwd", []).append(
                    (snap(params_i), snap(cin), snap(seg_keys[i])))
            if res_mode[i]:
                cout, res = seg_fwd_save[i](params_i, cin, seg_keys[i])
                residuals.append(res)
                inputs.append(None)
            else:
                inputs.append(cin)
                residuals.append(None)
                cout = seg_fwd_rec[i](params_i, cin, seg_keys[i])
            cur = dict(cout)
            for k in out_keys:
                if k.startswith("skip"):
                    skips[k] = cur.pop(k)

        logits = cur["tokens"]
        if collect is not None:
            collect["loss"] = (snap(logits), snap(targets))
        loss, g_logits, msums = loss_jit(logits, targets)

        g_tokens = g_logits
        g_skips: Dict[str, Any] = {}
        grads: Dict[str, Any] = {}
        for i in reversed(range(n_seg)):
            name = seg_names[i]
            in_keys, out_keys = _SEG_IO[name]
            g_out = {k: (g_tokens if k == "tokens" else g_skips.pop(k))
                     for k in out_keys}
            if res_mode[i]:
                if collect is not None:
                    collect.setdefault("bwd", []).insert(
                        0, (snap(residuals[i]), snap(g_out)))
                gp, g_in = seg_bwd_save[i](residuals[i], g_out)
                residuals[i] = None  # donated
            else:
                params_i = {k: params[k] for k in part[i]}
                if collect is not None:
                    collect.setdefault("bwd", []).insert(
                        0, (snap(params_i), snap(inputs[i]),
                            snap(seg_keys[i]), snap(g_out)))
                gp, g_in = seg_bwd_rec[i](params_i, inputs[i], seg_keys[i],
                                          g_out)
                inputs[i] = None  # donated
            for k in in_keys:
                if k.startswith("skip"):
                    g_skips[k] = g_in[k]
                else:
                    g_tokens = g_in[k]
            grads.update(gp)
        return grads, loss, msums

    def _ensure_res_mode(params, part, images, seg_key):
        nonlocal res_mode
        if res_mode is None:
            res_mode = _resolve_res_mode(params, part, images, seg_key)

    def step(state, images_u8, masks_u8, rng):
        assert state.batch_stats is None, \
            "segmented step supports LayerNorm models (CSWin) only"
        part = _part_for(state.params)
        keys = make_keys_jit(rng)

        if accum == 1:
            k_aug, seg_keys = keys[0], keys[1:]
            images, targets = prep_jit(images_u8, masks_u8, k_aug)
            _ensure_res_mode(state.params, part, images, seg_keys[0])
            grads, loss, msums = run_chain(state.params, part, images,
                                           targets, seg_keys)
        else:
            batch = images_u8.shape[0]
            if batch % accum:
                raise ValueError(
                    f"segmented grad_accum needs batch % accum == 0 "
                    f"(got {batch} % {accum})")
            mb = batch // accum
            acc = None
            for a in range(accum):
                sl = slice(a * mb, (a + 1) * mb)
                images, targets = prep_jit(images_u8[sl], masks_u8[sl],
                                           keys[a])
                seg_keys = keys[accum + a * n_seg:accum + (a + 1) * n_seg]
                _ensure_res_mode(state.params, part, images, seg_keys[0])
                grads, loss, msums = run_chain(state.params, part, images,
                                               targets, seg_keys)
                new = (grads, loss, msums)
                acc = new if acc is None else acc_add_jit(acc, new)
            grads, loss, msums = acc_scale_jit(acc)

        state = update_jit(state, grads)
        dice, iou = _metrics_from_sums(msums if accum == 1 else
                                       msums * accum)
        return state, {"loss": loss, "dice": dice, "iou": iou}

    def eval_step(state, images_u8, masks_u8):
        """Forward-only chain (deterministic, augment-free — reference eval
        semantics), same metric formulas as ``make_eval_step`` — the
        monolithic eval graph is compile-bounded at 2048^2 exactly like
        the train graph."""
        assert state.batch_stats is None
        images, targets = prep_eval_jit(images_u8, masks_u8)
        part = _part_for(state.params)
        key = jax.random.PRNGKey(0)  # unused: deterministic forward
        if rep is not None:
            key = jax.device_put(key, rep)
        cur = {"x": images}
        skips = {}
        for i, name in enumerate(seg_names):
            in_keys, out_keys = _SEG_IO[name]
            cin = {k: (cur.pop(k) if k in cur else skips.pop(k))
                   for k in in_keys}
            params_i = {k: state.params[k] for k in part[i]}
            cur = dict(_eval_seg[i](params_i, cin, key))
            for k in out_keys:
                if k.startswith("skip"):
                    skips[k] = cur.pop(k)
        return loss_metrics_jit(cur["tokens"], targets)

    _eval_seg = []
    for name, run in segments:
        # deterministic=True: eval disables every stochastic layer
        def efwd(params, carry, key, _run=run):
            return _run({"params": params}, carry, True, {"dropout": key})
        efwd.__name__ = f"seg_{name}_eval"  # see the naming note above
        if use_shard_map:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            def bspec(k):
                return P("data", None, None, None) if k == "x" \
                    else P("data", None, None)

            in_keys, out_keys = _SEG_IO[name]
            cin_spec = {k: bspec(k) for k in in_keys}
            cout_spec = {k: bspec(k) for k in out_keys}

            def efwd_sm(params, carry, key, _f=efwd, _ci=cin_spec,
                        _co=cout_spec):
                return shard_map(
                    _f, mesh=mesh, in_specs=(P(), _ci, P()),
                    out_specs=_co, check_vma=False)(params, carry, key)
            efwd_sm.__name__ = f"seg_{name}_evalsm"
            _eval_seg.append(jax.jit(efwd_sm))
        else:
            _eval_seg.append(jax.jit(efwd))

    def loss_metrics(logits, targets):
        loss = segmentation_loss(logits, targets, n_classes)
        msums = _metric_sums(logits, targets, n_classes)
        dice, iou = _metrics_from_sums(msums)
        return {"loss": loss, "dice": dice, "iou": iou}

    loss_metrics_jit = jax.jit(loss_metrics)

    def cost_flops(state, images_u8, masks_u8, rng):
        """Summed XLA cost-analysis FLOPs of the chain's compiled programs
        (VERDICT r03 #3 / r04 #3).

        Executes one real fwd+bwd chain, snapshotting every program's
        concrete argument shape/dtype/SHARDING structs, then lowers each
        program from those structs — so under a DP mesh this hits the
        exact warmed SPMD programs (no fresh unsharded compiles, the
        round-4 blocker for segmented+DP MFU) and the per-device flops are
        scaled back to global by the mesh size.

        ``useful``: prep + loss + optimizer + one fwd + one bwd — the
        standard fwd+bwd MFU numerator.  ``executed``: what the device
        actually runs per step.  With ``save_residuals=True`` the backward
        replays nothing, so executed == useful; recompute mode adds the
        forward chain again (each vjp program re-runs its forward).

        NB: meaningless under ``scan_stages`` — XLA cost analysis counts a
        scan body once regardless of trip count (the round-2 scan-MFU
        undercount); callers must gate on ``not model.scan_stages``.
        """
        if accum != 1:
            raise ValueError("cost_flops supports grad_accum == 1")

        def flops_of(jf, *args):
            c = jf.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            return float((c or {}).get("flops", 0.0) or 0.0)

        def snap(tree):
            return jax.tree.map(
                lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype,
                                               sharding=a.sharding), tree)

        part = _part_for(state.params)
        keys = make_keys_jit(rng)
        k_aug, seg_keys = keys[0], keys[1:]
        images, targets = prep_jit(images_u8, masks_u8, k_aug)
        _ensure_res_mode(state.params, part, images, seg_keys[0])
        ctx: Dict[str, Any] = {}
        run_chain(state.params, part, images, targets, seg_keys,
                  collect=ctx)

        useful = flops_of(prep_jit, snap(images_u8), snap(masks_u8),
                          snap(k_aug))
        useful += flops_of(loss_jit, *ctx["loss"])
        # grads share the params' tree/shape/sharding (replicated under DP)
        useful += flops_of(update_jit, snap(state), snap(state.params))
        # Per-segment accounting (mixed residual policy): a residual-saving
        # segment's fwd program holds the forward (+ residual emission) and
        # its bwd program only the backward — both useful, no recompute.  A
        # recompute segment's vjp program holds fwd+bwd (useful once); its
        # separate forward-chain program is pure recompute overhead.
        recompute = 0.0
        for i in range(n_seg):
            if res_mode[i]:
                useful += flops_of(seg_fwd_save[i], *ctx["fwd"][i])
                useful += flops_of(seg_bwd_save[i], *ctx["bwd"][i])
            else:
                useful += flops_of(seg_bwd_rec[i], *ctx["bwd"][i])
                recompute += flops_of(seg_fwd_rec[i], *ctx["fwd"][i])
        executed = useful + recompute
        scale = float(n_dev)  # SPMD cost analysis reports per-device flops
        return {"useful": useful * scale, "executed": executed * scale}

    step.eval_step = eval_step
    step.cost_flops = cost_flops
    # diagnostic: the per-segment policy actually in effect (None until an
    # "auto" build's first call resolves it)
    step.residual_policy = lambda: (
        None if res_mode is None else dict(zip(seg_names, res_mode)))
    return step
