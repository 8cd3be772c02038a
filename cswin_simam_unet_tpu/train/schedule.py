"""Reduce-on-plateau LR scheduling with torch-identical semantics.

Parity target: ``torch.optim.lr_scheduler.ReduceLROnPlateau(optimizer,
mode='min', factor=0.5, patience=5, min_lr=1e-7)`` stepped on the **test**
loss each epoch (train_unet_segmentation.py:379-380,494-500).  Torch
defaults reproduced: threshold 1e-4 (relative), cooldown 0, eps 1e-8.

Epoch-level host logic — a tiny pure-Python state machine whose state is a
plain dict so it checkpoints alongside params.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ReduceLROnPlateau:
    lr: float
    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    threshold_mode: str = "rel"  # 'rel' | 'abs'
    cooldown: int = 0
    min_lr: float = 1e-7
    eps: float = 1e-8
    best: float = field(default=float("inf"))
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def _is_better(self, current: float) -> bool:
        if self.threshold_mode == "rel":
            return current < self.best * (1.0 - self.threshold)
        return current < self.best - self.threshold

    def step(self, metric: float) -> float:
        """Record an epoch metric; return the (possibly reduced) LR."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {k: getattr(self, k) for k in (
            "lr", "factor", "patience", "threshold", "threshold_mode",
            "cooldown", "min_lr", "eps", "best", "num_bad_epochs",
            "cooldown_counter")}

    def load_state_dict(self, state: dict) -> None:
        for k, v in state.items():
            setattr(self, k, v)
