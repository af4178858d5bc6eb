"""Jitted train / eval steps for all three model families.

One XLA graph per step contains: forward (encoder + decoder + APM +
refinement), every loss term (CE + adaptive-margin contrast + ambiguity
regression), gradients, clipping, the optimizer update and the confusion
matrix — the TPU-first replacement for the reference's eager
``train_one_epoch`` hot loop (``main_AA.py:370-428``).

Model kinds:
  * 'base' — BaseSeg, criterion(logits, y)                     (main.py)
  * 'aa'   — BaseSeg_AMContrast3D, CrossEntropyAce             (main_AA.py)
  * 'mm'   — BaseSeg_M_AMContrast3D, CrossEntropyAcePre        (main_MM.py)

Distributed: pass ``axis_name='dp'`` and wrap with
:func:`make_sharded_train_step` — gradients are ``pmean``-ed (DDP allreduce),
metrics ``psum``-ed, BN stats averaged via the BatchNorm ``axis_name``
(SyncBN).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P

from ..utils.metrics import confusion_matrix_update


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx, batch: Dict, rng) -> TrainState:
    variables = model.init({"params": rng}, batch["pos"], batch["x"],
                           training=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats,
                      opt_state=tx.init(params))


def build_tx(optimizer_cfg, lr_schedule, grad_norm_clip: Optional[float] = None,
             plateau: bool = False, param_labels=None):
    from ..optim import build_optimizer_from_cfg
    tx = build_optimizer_from_cfg(optimizer_cfg, lr=lr_schedule)
    if grad_norm_clip is not None and grad_norm_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_norm_clip), tx)
    if plateau:
        # host-controlled LR scale for the metric-driven plateau scheduler;
        # OUTSIDE the base optimizer so it rescales the final update like a
        # torch param-group LR change (scheduler/plateau_lr.py)
        from ..scheduler.plateau_lr import scale_by_plateau
        tx = optax.chain(tx, scale_by_plateau())
    if param_labels is not None:
        # frozen params (↔ requires_grad=False, main_AA.py:239-241): zero
        # their grads BEFORE the chain (so they don't pollute the global-norm
        # clip, matching torch's grad=None) and their updates AFTER it (so
        # AdamW's unconditional weight decay can't drift them)
        zero_frozen = optax.multi_transform(
            {"trainable": optax.identity(), "frozen": optax.set_to_zero()},
            param_labels)
        tx = optax.chain(zero_frozen, tx, zero_frozen)
    return tx


def _forward_loss(model, criterion, kind: str, num_classes: int,
                  ignore_index, ambiguity_args, params, batch_stats,
                  batch, dropout_rng):
    variables = {"params": params, "batch_stats": batch_stats}
    target = batch["y"]
    apply_kwargs = dict(training=True, rngs={"dropout": dropout_rng},
                        mutable=["batch_stats"])
    aux_metrics: Dict[str, jnp.ndarray] = {}
    if kind == "base":
        logits, mut = model.apply(variables, batch["pos"], batch["x"],
                                  **apply_kwargs)
        loss = criterion(logits, target)
    elif kind == "aa":
        (logits, stages), mut = model.apply(variables, batch["pos"], batch["x"],
                                            **apply_kwargs)
        key = "f_up" if ambiguity_args.get("stages", "up") == "up" else "f_down"
        up = list(zip(stages["p"], stages[key]))
        loss = criterion(logits, target, up, num_classes, ignore_index,
                         ambiguity_args)
    elif kind == "mm":
        mm_kwargs = dict(apply_kwargs)
        if ambiguity_args.get("source") == "AEF":
            mm_kwargs["target"] = target  # GT-driven refinement (train only)
        (logits, stages, rate), mut = model.apply(
            variables, batch["pos"], batch["x"], **mm_kwargs)
        key = "f_up" if ambiguity_args.get("stages", "up") == "up" else "f_down"
        up = list(zip(stages["p"], stages[key]))
        seg, ce, con, reg = criterion(logits, target, up, stages["ambiguity"],
                                      num_classes, ignore_index, ambiguity_args)
        loss = seg + reg
        aux_metrics = {"loss_seg": seg, "loss_ce": ce, "loss_contrast": con,
                       "loss_reg": reg, "refine_rate": rate}
    else:
        raise ValueError(kind)
    return loss, (mut["batch_stats"], logits, aux_metrics)


def make_train_step(model, criterion, tx, kind: str, num_classes: int,
                    ignore_index=None, ambiguity_args=None,
                    axis_name: Optional[str] = None,
                    needs_hessian: bool = False) -> Callable:
    """Returns step(state, batch, rng) → (state, metrics dict).

    needs_hessian: for adahessian — the step additionally computes the
    Hutchinson Hessian-diagonal estimate (one jvp through the gradient
    function, same compiled graph) and feeds it to ``tx.update(...,
    hess=...)``.  The probe key is derived before the per-replica fold, so
    every replica draws the same z (↔ the reference's fixed-seed generator,
    adahessian.py "same zs across all GPUs")."""
    ambiguity_args = dict(ambiguity_args or {})
    loss_fn = functools.partial(_forward_loss, model, criterion, kind,
                                num_classes, ignore_index, ambiguity_args)

    def step(state: TrainState, batch: Dict, rng) -> Tuple[TrainState, Dict]:
        rng0 = jax.random.fold_in(rng, state.step)
        rng = rng0
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)
        hess = None
        if needs_hessian:
            from ..optim.adahessian import rademacher_tree
            zs = rademacher_tree(jax.random.fold_in(rng0, 7), state.params)
            f = lambda p: grad_fn(p, state.batch_stats, batch, rng)
            # one jvp yields the primal ((loss, aux), grads) AND the HVP Hz
            # in the grads slot of the tangents — no second backward pass
            ((loss, (batch_stats, logits, aux)), grads), tangents = jax.jvp(
                f, (state.params,), (zs,))
            hz = tangents[1]
            hess = jax.tree_util.tree_map(lambda h, z: h * z, hz, zs)
        else:
            (loss, (batch_stats, logits, aux)), grads = grad_fn(
                state.params, state.batch_stats, batch, rng)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            aux = jax.lax.pmean(aux, axis_name)
            if hess is not None:
                hess = jax.lax.pmean(hess, axis_name)
        if hess is not None:
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params, hess=hess)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        cm = confusion_matrix_update(jnp.argmax(logits, -1), batch["y"],
                                     num_classes, ignore_index)
        if axis_name is not None:
            cm = jax.lax.psum(cm, axis_name)
        metrics = {"loss": loss, "cm": cm, **aux}
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=batch_stats,
                                  opt_state=opt_state)
        return new_state, metrics

    return step


def make_predict_step(model) -> Callable:
    """Logits-only forward for host-scored eval paths (whole-scene voting,
    sphere protocol) — no label input and no device confusion matrix, so the
    eval batch needs no placeholder ``y`` and nothing is computed-then-dropped."""

    def step(state: TrainState, batch: Dict) -> jnp.ndarray:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["pos"], batch["x"], training=False)
        return out[0] if isinstance(out, tuple) else out

    return step


def make_eval_step(model, kind: str, num_classes: int, ignore_index=None,
                   axis_name: Optional[str] = None) -> Callable:
    """Returns eval(state, batch) → metrics (logits + confusion matrix)."""

    def step(state: TrainState, batch: Dict) -> Dict:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        out = model.apply(variables, batch["pos"], batch["x"], training=False)
        logits = out[0] if isinstance(out, tuple) else out
        cm = confusion_matrix_update(jnp.argmax(logits, -1), batch["y"],
                                     num_classes, ignore_index)
        if axis_name is not None:
            cm = jax.lax.psum(cm, axis_name)
        return {"logits": logits, "cm": cm}

    return step


def make_sharded_train_step(step_fn: Callable, mesh: Mesh,
                            axis_name: str = "dp") -> Callable:
    """shard_map wrapper: batch split over 'dp', state replicated, outputs
    replicated (grads/metrics already reduced inside via pmean/psum)."""
    shard_map = _get_shard_map()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def _get_shard_map():
    # check_vma is disabled: loop carries inside FPS start as replicated
    # constants and become device-varying, which the VMA checker rejects
    # even though the program is correct under pmean/psum reductions.
    if hasattr(jax, "shard_map"):
        return jax.shard_map
    from jax.experimental.shard_map import shard_map as _sm

    def _compat(f=None, *, mesh, in_specs, out_specs, check_vma=True):
        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=check_vma)
    return _compat


def make_sharded_eval_step(step_fn: Callable, mesh: Mesh,
                           axis_name: str = "dp") -> Callable:
    shard_map = _get_shard_map()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs={"logits": P(axis_name), "cm": P()},
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_predict_step(step_fn: Callable, mesh: Mesh,
                              axis_name: str = "dp") -> Callable:
    """Batch-sharded logits-only forward: stacks independent eval subclouds
    on the batch axis and splits them over the mesh.  Used by the whole-scene
    voting test to score ``n_devices`` voxel-rank subclouds per dispatch —
    a capability the reference explicitly lacks (multi-GPU testing is
    disallowed, ``main_AA.py:362-363``)."""
    shard_map = _get_shard_map()
    sharded = shard_map(
        step_fn, mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
