"""LR schedulers (↔ openpoints/scheduler/, timm-derived).

``build_scheduler_from_cfg(cfg)`` returns ``(lr_fn, epochs)`` where
``lr_fn(epoch)`` gives the LR for that epoch — the reference steps schedulers
per epoch (``scheduler.step(epoch)``, main_AA.py:310-311).  For the jitted
train loop, :func:`as_step_schedule` turns it into an optax per-step schedule
via ``epoch = step // steps_per_epoch`` (identical values, no host sync).

Supported: cosine (t_initial=epochs, lr_min, warmup), multistep, step, poly,
tanh, plateau-as-multistep fallback.  S3DIS uses cosine
(``cfgs/s3dis/default.yaml:72``), ScanNet multistep [70, 90]×0.1
(``cfgs/scannet/default.yaml:75-80``).
"""
from __future__ import annotations

import math
from typing import Callable, List, Tuple

import jax.numpy as jnp
import numpy as np


def build_scheduler_from_cfg(cfg) -> Tuple[Callable[[int], float], int]:
    cfg = dict(cfg)
    name = str(cfg.get("sched", "cosine")).lower()
    epochs = int(cfg.get("epochs", 100))
    lr = float(cfg.get("lr", 1e-3))
    min_lr = float(cfg.get("min_lr", 1e-5) or 0.0)
    warmup_epochs = int(cfg.get("warmup_epochs", 0) or 0)
    warmup_lr = float(cfg.get("warmup_lr", 1e-6) or 1e-6)
    decay_rate = float(cfg.get("decay_rate", 0.1) or 0.1)

    def with_warmup(fn):
        def sched(epoch):
            e = jnp.asarray(epoch, dtype=jnp.float32)
            if warmup_epochs > 0:
                warm = warmup_lr + (lr - warmup_lr) * e / warmup_epochs
                return jnp.where(e < warmup_epochs, warm, fn(e))
            return fn(e)
        return sched

    if name == "cosine":
        def fn(e):
            t = jnp.clip(e / max(epochs, 1), 0.0, 1.0)
            return min_lr + 0.5 * (lr - min_lr) * (1.0 + jnp.cos(jnp.pi * t))
        return with_warmup(fn), epochs
    if name in ("multistep", "multisteplr"):
        milestones = sorted(cfg.get("decay_epochs", cfg.get("milestones", [30, 60])))
        ms = jnp.asarray(milestones, dtype=jnp.float32)

        def fn(e):
            return lr * decay_rate ** jnp.sum(e >= ms)
        return with_warmup(fn), epochs
    if name == "step":
        decay_epochs = float(cfg.get("decay_epochs", 30))

        def fn(e):
            return lr * decay_rate ** jnp.floor(e / decay_epochs)
        return with_warmup(fn), epochs
    if name == "poly":
        power = float(cfg.get("power", 0.9))

        def fn(e):
            t = jnp.clip(e / max(epochs, 1), 0.0, 1.0)
            return (lr - min_lr) * (1.0 - t) ** power + min_lr
        return with_warmup(fn), epochs
    if name == "tanh":
        lb, ub = float(cfg.get("lb", -7.0)), float(cfg.get("ub", 3.0))

        def fn(e):
            t = jnp.clip(e / max(epochs, 1), 0.0, 1.0)
            return min_lr + 0.5 * (lr - min_lr) * (1.0 - jnp.tanh(lb + (ub - lb) * t))
        return with_warmup(fn), epochs
    if name in ("plateau", "plateau_lr"):
        # metric-driven: base LR is constant (after warmup); the plateau decay
        # is a host-controlled scale inside opt_state (scheduler/plateau_lr.py)
        from .plateau_lr import PlateauScheduler
        fn = with_warmup(lambda e: jnp.asarray(lr, jnp.float32))
        fn.plateau = PlateauScheduler(
            base_lr=lr, mode=str(cfg.get("mode", "max")),
            decay_rate=decay_rate,
            patience_t=int(cfg.get("patience_epochs",
                                   cfg.get("patience_t", 10))),
            threshold=float(cfg.get("threshold", 1e-4)),
            cooldown_t=int(cfg.get("cooldown_epochs", cfg.get("cooldown_t", 0))),
            lr_min=min_lr)
        return fn, epochs
    raise ValueError(f"scheduler {name} not supported")


def as_step_schedule(lr_fn: Callable, steps_per_epoch: int,
                     start_epoch: int = 1) -> Callable[[int], float]:
    """optax-compatible per-step schedule with per-epoch granularity."""
    def sched(step):
        epoch = start_epoch + step // max(steps_per_epoch, 1)
        return lr_fn(epoch)
    return sched
