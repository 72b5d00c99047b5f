"""Host-side LR schedulers (epoch granularity).

The trainer injects the learning rate as an optax hyperparameter, so a
host-side scheduler adjusts it between epoch dispatches with ZERO
recompilation. Reference capability: torch ReduceLROnPlateau at
deepfm/training/trainer.py:80-89 (plateau semantics matched incl. the
1e-4 relative threshold); warmup-cosine is beyond reference scope.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["PlateauScheduler", "CosineScheduler", "set_lr"]


class PlateauScheduler:
    """Host-side reduce-on-plateau (mode max, factor 0.5, patience 2),
    matching torch ReduceLROnPlateau semantics incl. the 1e-4 relative
    threshold (reference trainer.py:80-89)."""

    def __init__(
        self,
        lr: float,
        factor: float = 0.5,
        patience: int = 2,
        threshold: float = 1e-4,
        enabled: bool = True,
    ) -> None:
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.enabled = enabled
        self.best = -float("inf")
        self.num_bad = 0

    def step(self, metric: float) -> float:
        if not self.enabled:
            return self.lr
        if metric > self.best * (1 + self.threshold) or self.best == -float(
            "inf"
        ):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr *= self.factor
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]


class CosineScheduler:
    """Host-side warmup + cosine decay at EPOCH granularity.

    LR for epoch ``e`` (1-based): linear ramp ``base * e / warmup`` over
    the first ``warmup_epochs`` epochs, then cosine decay from ``base``
    to ``min_frac * base`` at the final epoch. Epoch granularity is this
    trainer's natural resolution — an epoch is one compiled scan
    dispatch, and the host adjusts the injected learning-rate
    hyperparameter between dispatches (the same zero-recompilation
    mechanism reduce-on-plateau uses), so the schedule composes with
    the fused table-Adam kernels unchanged. Beyond reference scope (the
    reference ships only ReduceLROnPlateau, reference
    deepfm/training/trainer.py:80-89).
    """

    def __init__(
        self,
        lr: float,
        total_epochs: int,
        warmup_epochs: int = 0,
        min_frac: float = 0.01,
    ) -> None:
        self.base = lr
        self.total = max(total_epochs, 1)
        self.warmup = max(min(warmup_epochs, self.total - 1), 0)
        self.min_lr = min_frac * lr
        self.epoch = 1
        self.lr = self._lr_for(1)

    def _lr_for(self, e: int) -> float:
        import math

        if self.warmup and e <= self.warmup:
            return self.base * e / self.warmup
        t = (e - self.warmup - 1) / max(self.total - self.warmup - 1, 1)
        return self.min_lr + 0.5 * (self.base - self.min_lr) * (
            1.0 + math.cos(math.pi * min(max(t, 0.0), 1.0))
        )

    def step(self, metric: float) -> float:
        """Advance to the next epoch's LR (the metric is ignored)."""
        self.epoch += 1
        self.lr = self._lr_for(min(self.epoch, self.total))
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "epoch": self.epoch}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.epoch = d["epoch"]


def set_lr(opt_state, lr: float):
    """Update the injected learning-rate hyperparameter in place-ish."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)
