"""Optimizer + LR schedule.

Matches the reference's training recipe (reference src/train.py:86-97):
Adam(amsgrad=True) with torch-style L2 weight decay (added to the gradient
*before* the moment updates), elementwise gradient value clipping at 5.0
applied before the optimizer, and a ReduceLROnPlateau schedule stepped on the
validation CIDEr.

The plateau scheduler is host-side state; the learning rate reaches the
jitted update through ``optax.inject_hyperparams`` so changing it does NOT
trigger a recompile.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax

from mvc_tpu.config import TrainerConfig


class TorchAmsgradState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates
    nu_max: optax.Updates


def scale_by_torch_amsgrad(b1=0.9, b2=0.999, eps=1e-8,
                           state_dtype=None) -> optax.GradientTransformation:
    """torch.optim.Adam(amsgrad=True) semantics exactly: the max accumulator
    tracks the RAW second moment and the bias correction divides the
    denominator (optax.amsgrad maxes the bias-corrected moment instead, which
    diverges early in training — tests/test_optimizer_parity.py).

    ``state_dtype`` (opt-in, non-parity — PARITY.md): store the three moment
    trees (mu, nu, nu_max) in a reduced dtype; the update math still runs in
    f32 (moments are upcast on read, rounded on store).  At the production
    dual+global model those trees are 3 x 163.6 MB f32 — the train step's
    largest optimizer stream (BENCH_NOTES round 5); bf16 state halves it for
    ~0.4% relative moment rounding."""
    sd = None if state_dtype is None else jnp.dtype(state_dtype)

    def store(x):
        return x if sd is None else x.astype(sd)

    def f32(x):
        return x.astype(jnp.float32)

    def init_fn(params):
        def zeros(p):
            return jnp.zeros_like(p, dtype=sd or p.dtype)

        return TorchAmsgradState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
            nu_max=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * f32(m) + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * f32(v) + (1 - b2) * g * g,
                          state.nu, updates)
        nu_max = jax.tree.map(lambda vm, v: jnp.maximum(f32(vm), v),
                              state.nu_max, nu)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, vmax: (m / bc1) / (jnp.sqrt(vmax) / jnp.sqrt(bc2) + eps),
            mu, nu_max,
        )
        return new_updates, TorchAmsgradState(
            count, jax.tree.map(store, mu), jax.tree.map(store, nu),
            jax.tree.map(store, nu_max))

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: TrainerConfig) -> optax.GradientTransformation:
    """clip(value) -> +wd*p -> amsgrad/adam -> lr (injected)."""
    state_dtype = getattr(cfg, "adam_state_dtype", None)

    def build(learning_rate):
        steps = []
        if cfg.gradient_clip_value and cfg.gradient_clip_value > 0:
            steps.append(optax.clip(cfg.gradient_clip_value))
        if cfg.weight_decay:
            steps.append(optax.add_decayed_weights(cfg.weight_decay))
        if cfg.amsgrad:
            steps.append(scale_by_torch_amsgrad(state_dtype=state_dtype))
            steps.append(optax.scale_by_learning_rate(learning_rate))
        else:
            steps.append(optax.adam(learning_rate))
        return optax.chain(*steps)

    return optax.inject_hyperparams(build)(learning_rate=cfg.lr)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_learning_rate(opt_state, lr: float):
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


@dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (reference src/train.py:89-96): factor 0.5,
    patience 5, min_lr 1e-7.  ``mode`` defaults to "max" (sane for CIDEr);
    "min" reproduces the reference quirk of stepping a min-mode scheduler on a
    higher-is-better metric (PARITY.md)."""

    lr: float
    factor: float = 0.5
    patience: int = 5
    min_lr: float = 1e-7
    mode: str = "max"
    threshold: float = 1e-4

    def __post_init__(self):
        self.best = None
        self.num_bad = 0

    def _improved(self, metric: float) -> bool:
        if self.best is None:
            return True
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        """Returns the (possibly decayed) learning rate."""
        if self._improved(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                new_lr = max(self.lr * self.factor, self.min_lr)
                if new_lr < self.lr:
                    print(f"Plateau: reducing lr {self.lr:.2e} -> {new_lr:.2e}")
                self.lr = new_lr
                self.num_bad = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "num_bad": self.num_bad}

    def load_state_dict(self, d: dict) -> None:
        self.lr = d["lr"]
        self.best = d["best"]
        self.num_bad = d["num_bad"]
