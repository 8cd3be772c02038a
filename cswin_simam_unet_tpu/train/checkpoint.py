"""Checkpoint/resume via orbax: full training state, every epoch.

The reference saves final weights only, once, after all 100 epochs
(train_unet_segmentation.py:537) — a crash loses the run.  Here every epoch
checkpoints params, optimizer state, batch stats, plateau-scheduler state,
and the metric history; ``latest`` resume restores bit-identical training
state, and the best-on-test-Dice checkpoint is tracked separately
(SURVEY.md §5 checkpoint/resume plan).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from cswin_simam_unet_tpu.train.schedule import ReduceLROnPlateau


def save_weights(path: str, state) -> None:
    """Standalone weights artifact (msgpack): the TPU-native equivalent of
    the reference's single final ``torch.save(model.state_dict())``
    (train_unet_segmentation.py:537, train_cswinunet_segmentation.py:992)."""
    from flax import serialization
    payload = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        payload["batch_stats"] = jax.device_get(state.batch_stats)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_weights(path: str, state):
    """Load a ``save_weights`` artifact back into a TrainState (the loading
    path the reference never ships — SURVEY.md §5 checkpoint/resume)."""
    from flax import serialization
    with open(path, "rb") as f:
        data = f.read()
    template = {"params": jax.device_get(state.params)}
    if state.batch_stats is not None:
        template["batch_stats"] = jax.device_get(state.batch_stats)
    payload = serialization.from_bytes(template, data)
    return state.replace(
        params=payload["params"],
        batch_stats=payload.get("batch_stats", state.batch_stats))


class CheckpointStore:
    """Epoch-granular checkpoint manager with best-Dice tracking."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=None,
                create=True,
            ),
        )
        self._meta_path = os.path.join(self.directory, "meta.json")
        self._best_path = os.path.join(self.directory,
                                       "best_weights.msgpack")

    def _read_meta(self) -> Dict:
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                return json.load(f)
        return {"best_dice": -1.0, "best_epoch": 0}

    def _write_meta(self, meta: Dict) -> None:
        with open(self._meta_path, "w") as f:
            json.dump(meta, f)

    def save_epoch(self, epoch: int, state, scheduler: ReduceLROnPlateau,
                   history: Dict[str, list], test_dice: float,
                   global_step: int = 0) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if state.batch_stats is not None:
            payload["batch_stats"] = state.batch_stats
        extra = {
            "epoch": epoch,
            "global_step": int(global_step),
            "scheduler": scheduler.state_dict(),
            "history": history,
        }
        self.manager.save(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(payload),
                extra=ocp.args.JsonSave(extra),
            ),
        )
        meta = self._read_meta()
        if test_dice > meta.get("best_dice", -1.0):
            meta["best_dice"] = float(test_dice)
            meta["best_epoch"] = epoch
            # Persist the best epoch's WEIGHTS outside orbax retention:
            # max_to_keep prunes old epochs, which used to delete the best
            # checkpoint while meta.json kept pointing at it.  A standalone
            # msgpack (the same format as the final-weights artifact, so
            # predict/evaluate/export-torch load it directly) survives any
            # retention policy; the D2H fetch happens only on improving
            # epochs.
            save_weights(self._best_path, state)
            self._write_meta(meta)

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state, epoch: Optional[int] = None
                ) -> Tuple[Any, ReduceLROnPlateau, Dict[str, list], int, int]:
        """Restore (state, scheduler, history, epoch, global_step).
        ``state`` provides the target pytree structure (from
        ``create_train_state``).  ``global_step`` feeds ``fit()`` so the
        resumed run's RNG folds equal the uninterrupted run's."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if state.batch_stats is not None:
            template["batch_stats"] = state.batch_stats
        restored = self.manager.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(template),
                extra=ocp.args.JsonRestore(),
            ),
        )
        payload = restored["state"]
        extra = restored["extra"]
        state = state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            step=int(payload["step"]),
            batch_stats=payload.get("batch_stats", state.batch_stats),
        )
        scheduler = ReduceLROnPlateau(lr=0.0)
        scheduler.load_state_dict(extra["scheduler"])
        return (state, scheduler, extra["history"], int(extra["epoch"]),
                int(extra.get("global_step", 0)))

    def restore_weights(self, epoch: Optional[int] = None
                        ) -> Tuple[Dict, int]:
        """Weights-only restore: ({'params', 'batch_stats'?}, epoch).

        Template-free orbax read — no second model init and no optimizer
        moment allocation (predict/evaluate/export never touch opt_state;
        building an Adam template just to restore into it doubled their
        cold-start, ~15 s/init for CSWin over a remote-TPU link)."""
        epoch = epoch if epoch is not None else self.manager.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        restored = self.manager.restore(
            epoch,
            args=ocp.args.Composite(state=ocp.args.StandardRestore()),
        )
        payload = restored["state"]
        out = {"params": payload["params"]}
        if "batch_stats" in payload:
            out["batch_stats"] = payload["batch_stats"]
        return out, int(epoch)

    def reset(self) -> None:
        """Clear every saved epoch and the best-Dice records.

        A fresh (non-resume) training run into a directory holding an older
        run's checkpoints would otherwise inherit its epoch numbering and
        best-Dice meta — a later ``--resume`` could silently restore the
        OLD run's epoch.  The CLI calls this when training without
        ``--resume`` over an existing store."""
        for step in list(self.manager.all_steps()):
            self.manager.delete(step)
        for path in (self._meta_path, self._best_path):
            if os.path.exists(path):
                os.remove(path)

    def best_epoch(self) -> Tuple[int, float]:
        meta = self._read_meta()
        return meta.get("best_epoch", 0), meta.get("best_dice", -1.0)

    def best_weights_path(self) -> Optional[str]:
        """Path of the best-on-test-Dice weights artifact, if any epoch has
        been saved (weights-only msgpack; optimizer state lives in the
        epoch checkpoints)."""
        return self._best_path if os.path.exists(self._best_path) else None

    def close(self) -> None:
        self.manager.close()
