"""AdaHessian — second-order optimizer via Hutchinson Hessian-diagonal traces.

↔ ``openpoints/optim/adahessian.py`` (the vendored ada-hessian torch class).
TPU-first split: the torch class owns both the HVP machinery (a second
``torch.autograd.grad`` through the retained graph) and the update rule; in
JAX the natural decomposition is

* :func:`hutchinson_diag` — the Hutchinson estimator ``E[z ⊙ (Hz)]`` with
  Rademacher probes, where each ``Hz`` is one ``jax.jvp`` through the
  gradient function (forward-over-reverse; XLA fuses it into the same
  compiled step — no eager second backward);
* :func:`adahessian` — an optax ``GradientTransformationExtraArgs`` holding
  the update rule (AdamW-style decoupled weight decay, EMA of grads, EMA of
  squared Hessian diagonal, ``hessian_power`` exponent on the denominator);
  the per-step diagonal estimate arrives via ``tx.update(..., hess=...)``.

The train step wires the two together when the config names ``adahessian``
(engine/train.py: ``needs_hessian``); like the reference's fixed-seed
generator ("same z across all GPUs"), the probe key is derived from the step
only — identical on every data-parallel replica — and the local estimates
are ``pmean``-ed alongside the gradients.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


def rademacher_tree(key: jax.Array, params: Any) -> Any:
    """A ±1 probe with the pytree structure/shapes/dtypes of ``params``."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    ks = jax.random.split(key, len(leaves))
    return treedef.unflatten([
        jax.random.rademacher(kk, l.shape, l.dtype)
        for kk, l in zip(ks, leaves)])


def hutchinson_diag(grad_fn: Callable, params: Any, key: jax.Array,
                    n_samples: int = 1, has_aux: bool = False) -> Any:
    """Hutchinson estimate of the Hessian diagonal of a scalar loss.

    grad_fn: params → grads (same pytree as params); typically
    ``jax.grad(loss_fn)`` closed over the batch.  Each sample draws a
    Rademacher probe z and computes ``z ⊙ (Hz)`` with one jvp
    (↔ adahessian.py ``set_hessian``: ``torch.autograd.grad(grads, params,
    grad_outputs=zs)`` then ``p.hess += h_z * z / n_samples``).
    """
    def one(k):
        zs = rademacher_tree(k, params)
        if has_aux:
            _, hz = jax.jvp(lambda p: grad_fn(p)[0], (params,), (zs,))
        else:
            _, hz = jax.jvp(grad_fn, (params,), (zs,))
        return jax.tree_util.tree_map(lambda h, z: h * z, hz, zs)

    acc = one(key)
    for i in range(1, n_samples):
        nxt = one(jax.random.fold_in(key, i))
        acc = jax.tree_util.tree_map(jnp.add, acc, nxt)
    if n_samples > 1:
        acc = jax.tree_util.tree_map(lambda h: h / n_samples, acc)
    return acc


class AdaHessianState(NamedTuple):
    count: chex.Array
    exp_avg: Any
    exp_hessian_diag_sq: Any


def adahessian(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0,
               hessian_power: float = 1.0,
               mask: Optional[Any] = None) -> optax.GradientTransformationExtraArgs:
    """AdaHessian update rule (adahessian.py ``step``, the non-HVP half).

    Expects the Hutchinson diagonal via ``update(..., hess=...)``; per torch,

        m   ← β₁·m + (1−β₁)·g            v ← β₂·v + (1−β₂)·hess²
        p   ← p·(1 − lr·wd)              (decoupled, AdamW-style)
        p   ← p − (lr/bc₁) · m̂ / ((v/bc₂)^(k/2) + eps)

    ``mask`` limits the decoupled decay (the reference factory's
    bias/norm-free param groups).
    """

    def init(params):
        z = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdaHessianState(count=jnp.zeros((), jnp.int32),
                               exp_avg=z(), exp_hessian_diag_sq=z())

    def update(grads, state, params=None, *, hess=None, **extra):
        del extra
        if params is None:
            raise ValueError("adahessian requires params")
        if hess is None:
            raise ValueError(
                "adahessian requires the Hutchinson Hessian diagonal: "
                "tx.update(grads, state, params, hess=hutchinson_diag(...))")
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) \
            else learning_rate
        m = jax.tree_util.tree_map(
            lambda mm, g: b1 * mm + (1 - b1) * g, state.exp_avg, grads)
        v = jax.tree_util.tree_map(
            lambda vv, h: b2 * vv + (1 - b2) * h * h,
            state.exp_hessian_diag_sq, hess)
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        k2 = hessian_power / 2.0

        def upd(mm, vv, p, decay):
            denom = (vv / bc2) ** k2 + eps
            u = -(lr / bc1) * mm / denom
            if weight_decay:
                u = u - lr * weight_decay * p * decay
            return u

        if mask is not None:
            dm = mask(params) if callable(mask) else mask
            decay_tree = jax.tree_util.tree_map(
                lambda d: jnp.asarray(1.0 if d else 0.0), dm)
        else:
            decay_tree = jax.tree_util.tree_map(lambda p: 1.0, params)
        updates = jax.tree_util.tree_map(upd, m, v, params, decay_tree)
        return updates, AdaHessianState(count=count, exp_avg=m,
                                        exp_hessian_diag_sq=v)

    return optax.GradientTransformationExtraArgs(init, update)
