"""Metric-driven plateau LR scheduling (↔ openpoints/scheduler/plateau_lr.py,
which wraps torch ``ReduceLROnPlateau``).

TPU-native split of responsibilities: the jitted train step keeps a pure
per-step schedule for the *base* LR, and the plateau decision (a host-observed
validation metric) becomes a scalar multiplier living inside the optimizer
state (:func:`scale_by_plateau`).  Between epochs the host runs
:class:`PlateauScheduler.step` on the metric and writes the new scale into
``opt_state`` — one scalar transfer, no recompilation, no data-dependent
control flow inside jit.
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class PlateauScaleState(NamedTuple):
    scale: jnp.ndarray


def scale_by_plateau() -> optax.GradientTransformation:
    """Multiply final updates by a host-controlled scalar (initially 1).

    Appended OUTSIDE the base optimizer so the scale acts exactly like the LR
    reduction torch applies to ``param_group['lr']``: it rescales the whole
    update (including decoupled weight decay, which torch also couples to the
    group LR)."""

    def init(params):
        del params
        return PlateauScaleState(jnp.ones((), jnp.float32))

    def update(updates, state, params=None):
        del params
        out = jax.tree_util.tree_map(lambda u: u * state.scale, updates)
        return out, state

    return optax.GradientTransformation(init, update)


def set_plateau_scale(opt_state: Any, scale: float) -> Any:
    """Return ``opt_state`` with every :class:`PlateauScaleState` leaf set to
    ``scale`` (host-side, between epochs)."""

    def repl(s):
        if isinstance(s, PlateauScaleState):
            return PlateauScaleState(jnp.asarray(scale, jnp.float32))
        if isinstance(s, tuple):
            vals = tuple(repl(x) for x in s)
            return type(s)(*vals) if hasattr(s, "_fields") else vals
        if isinstance(s, list):
            return [repl(x) for x in s]
        return s

    return repl(opt_state)


class PlateauScheduler:
    """Host-side ReduceLROnPlateau with torch's 'rel' threshold semantics
    (↔ plateau_lr.py:35-44 constructing torch ReduceLROnPlateau with
    patience/factor/threshold/cooldown/mode/min_lr).

    ``step(metric)`` returns the multiplicative scale (current_lr / base_lr)
    to write into the optimizer state."""

    def __init__(self, base_lr: float, mode: str = "max",
                 decay_rate: float = 0.1, patience_t: int = 10,
                 threshold: float = 1e-4, cooldown_t: int = 0,
                 lr_min: float = 0.0):
        assert mode in ("max", "min")
        self.base_lr = float(base_lr)
        self.lr = float(base_lr)
        self.mode = mode
        self.factor = float(decay_rate)
        self.patience = int(patience_t)
        self.threshold = float(threshold)
        self.cooldown_t = int(cooldown_t)
        self.lr_min = float(lr_min)
        self.best = -math.inf if mode == "max" else math.inf
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, a: float) -> bool:
        # torch threshold_mode='rel'
        if self.mode == "max":
            return a > self.best * (self.threshold + 1.0)
        return a < self.best * (1.0 - self.threshold)

    def step(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.lr_min)
            self.cooldown_counter = self.cooldown_t
            self.num_bad_epochs = 0
        return self.lr / self.base_lr

    # checkpoint/resume parity with the reference's state_dict
    def state_dict(self):
        return {"best": self.best, "lr": self.lr,
                "num_bad_epochs": self.num_bad_epochs,
                "cooldown_counter": self.cooldown_counter}

    def load_state_dict(self, sd):
        self.best = sd["best"]
        self.lr = sd.get("lr", self.lr)
        self.num_bad_epochs = sd.get("num_bad_epochs", 0)
        self.cooldown_counter = sd.get("cooldown_counter", 0)
