"""Reference custom optimizers as optax GradientTransformations.

TPU-native re-implementations of the update rules the reference vendors as
torch Optimizer classes:

* :func:`adamp` / :func:`sgdp` — projection-based optimizers (AdamP paper,
  https://arxiv.org/abs/2006.08217; ↔ ``openpoints/optim/adamp.py``,
  ``openpoints/optim/sgdp.py``).  The data-dependent projection branch
  (project the update orthogonal to the weight when grad ⟂ weight) becomes
  ``jnp.where`` on a scalar condition — no host sync, fully jittable.
* :func:`madgrad` — dual-averaged adaptive method (↔ ``optim/madgrad.py``,
  dense path; the sparse-gradient path has no TPU analogue).
* :func:`lookahead` — slow/fast weight wrapper (↔ ``optim/lookahead.py``),
  including the reference's lazy slow-buffer init (slow weights snap to the
  fast weights at the FIRST sync step).
* :func:`scale_by_layer_decay` — per-parameter LR scales from the ViT layer
  id of each param path (↔ ``optim/optim_factory.py:37-63``
  ``get_num_layer_for_vit`` / ``LayerDecayValueAssigner``).

Everything here returns additive updates (optax convention: ``new_p = p +
updates``), so weight decay that torch applies multiplicatively in-place is
folded into the returned update.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def _lr_at(lr: ScalarOrSchedule, count):
    return lr(count) if callable(lr) else jnp.asarray(lr, jnp.float32)


# ---------------------------------------------------------------------------
# projection (shared by AdamP / SGDP)  ↔ adamp.py:25-40
# ---------------------------------------------------------------------------

def _row_cosine_max(x2d: jnp.ndarray, y2d: jnp.ndarray, eps: float):
    """max over rows of |cos(x_r, y_r)| (↔ F.cosine_similarity(...).abs().max())."""
    dot = jnp.sum(x2d * y2d, axis=1)
    denom = jnp.maximum(jnp.linalg.norm(x2d, axis=1) *
                        jnp.linalg.norm(y2d, axis=1), eps)
    return jnp.max(jnp.abs(dot) / denom)


def _project_view(p, perturb, view, eps: float):
    """Remove the component of ``perturb`` along ``p`` under ``view`` rows."""
    expand = (-1,) + (1,) * (p.ndim - 1)
    p_n = p / (jnp.linalg.norm(view(p), axis=1) + eps).reshape(expand)
    coeff = jnp.sum(view(p_n * perturb), axis=1).reshape(expand)
    return perturb - p_n * coeff


def _projection(p, grad, perturb, delta: float, wd_ratio: float, eps: float):
    """↔ adamp.py:25-40: try channel view then layer view; if the gradient is
    (near-)orthogonal to the weight in that view, project the perturbation
    onto the tangent space and shrink weight decay by ``wd_ratio``."""
    if p.ndim <= 1:
        return perturb, jnp.ones((), p.dtype)
    channel_view = lambda x: x.reshape(x.shape[0], -1)
    layer_view = lambda x: x.reshape(1, -1)

    conds, projected = [], []
    for view in (channel_view, layer_view):
        cos_max = _row_cosine_max(view(grad), view(p), eps)
        n_col = view(p).shape[1]
        conds.append(cos_max < delta / jnp.sqrt(jnp.asarray(n_col, p.dtype)))
        projected.append(_project_view(p, perturb, view, eps))
    use_ch = conds[0]
    use_ly = jnp.logical_and(jnp.logical_not(conds[0]), conds[1])
    out = jnp.where(use_ch, projected[0],
                    jnp.where(use_ly, projected[1], perturb))
    wd = jnp.where(jnp.logical_or(use_ch, use_ly),
                   jnp.asarray(wd_ratio, p.dtype), jnp.ones((), p.dtype))
    return out, wd


# ---------------------------------------------------------------------------
# AdamP  ↔ adamp.py:43-105
# ---------------------------------------------------------------------------

class AdamPState(NamedTuple):
    count: chex.Array
    exp_avg: Any
    exp_avg_sq: Any


def adamp(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0, delta: float = 0.1,
          wd_ratio: float = 0.1, nesterov: bool = False,
          ) -> optax.GradientTransformation:
    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamPState(jnp.zeros((), jnp.int32), z,
                          jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        count = state.count + 1
        lr = _lr_at(learning_rate, state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state.exp_avg_sq, grads)

        def one(p, g, m, v):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            step_size = lr / bc1
            perturb = ((b1 * m + (1 - b1) * g) / denom) if nesterov \
                else m / denom
            perturb, wd = _projection(p, g, perturb, delta, wd_ratio, eps)
            upd = -step_size * perturb
            # reference runs with filter_bias_and_bn param groups: 1-d/bias
            # params carry weight_decay=0 (optim_factory.py:66-81)
            if weight_decay > 0 and p.ndim > 1:
                upd = upd - lr * weight_decay * wd * p
            return upd

        updates = jax.tree_util.tree_map(one, params, grads, exp_avg,
                                         exp_avg_sq)
        return updates, AdamPState(count, exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# SGDP  ↔ sgdp.py:19-70
# ---------------------------------------------------------------------------

class SGDPState(NamedTuple):
    count: chex.Array
    momentum: Any


def sgdp(learning_rate: ScalarOrSchedule, momentum: float = 0.9,
         dampening: float = 0.0, weight_decay: float = 0.0,
         nesterov: bool = False, eps: float = 1e-8, delta: float = 0.1,
         wd_ratio: float = 0.1) -> optax.GradientTransformation:
    def init(params):
        return SGDPState(jnp.zeros((), jnp.int32),
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        lr = _lr_at(learning_rate, state.count)

        def one(p, g, b):
            b = momentum * b + (1.0 - dampening) * g
            d_p = (g + momentum * b) if nesterov else b
            d_p, wd = _projection(p, g, d_p, delta, wd_ratio, eps)
            # reference quirk (sgdp.py:51-61): with nesterov=False, d_p
            # ALIASES the stored momentum buffer, so the in-place projection
            # also rewrites the buffer — reproduced for bit-parity
            if not nesterov:
                b = d_p
            upd = -lr * d_p
            if weight_decay != 0 and p.ndim > 1:
                upd = upd - lr * weight_decay * wd / (1.0 - momentum) * p
            return upd, b

        flat = jax.tree_util.tree_map(one, params, grads, state.momentum)
        is_tup = lambda t: isinstance(t, tuple)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=is_tup)
        buf = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=is_tup)
        return updates, SGDPState(state.count + 1, buf)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# MADGRAD  ↔ madgrad.py:24-184 (dense path)
# ---------------------------------------------------------------------------

class MadgradState(NamedTuple):
    count: chex.Array
    grad_sum_sq: Any
    s: Any
    x0: Any  # only meaningful when momentum != 0


def madgrad(learning_rate: ScalarOrSchedule, momentum: float = 0.9,
            weight_decay: float = 0.0, eps: float = 1e-6,
            decoupled_decay: bool = False) -> optax.GradientTransformation:
    if not 0 <= momentum < 1:
        raise ValueError(f"momentum {momentum} must be in [0,1)")
    ck = 1.0 - momentum

    def init(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        x0 = params if momentum != 0 else z
        return MadgradState(jnp.zeros((), jnp.int32), z,
                            jax.tree_util.tree_map(jnp.zeros_like, params),
                            x0)

    def update(grads, state, params):
        count = state.count + 1
        lr_raw = _lr_at(learning_rate, state.count)
        lamb = (lr_raw + eps) * jnp.sqrt(count.astype(jnp.float32))

        def one(p, g, gss, s, x0):
            p_eff = p
            if weight_decay != 0 and p.ndim > 1:
                if decoupled_decay:
                    p_eff = p * (1.0 - lr_raw * weight_decay)
                else:
                    g = g + weight_decay * p_eff
            if momentum == 0:
                rms0 = jnp.cbrt(gss) + eps
                x0_eff = p_eff + s / rms0
            else:
                x0_eff = x0
            gss_new = gss + lamb * g * g
            rms = jnp.cbrt(gss_new) + eps
            s_new = s + lamb * g
            z = x0_eff - s_new / rms
            p_new = z if momentum == 0 else (1.0 - ck) * p_eff + ck * z
            return p_new - p, gss_new, s_new, x0_eff

        flat = jax.tree_util.tree_map(one, params, grads, state.grad_sum_sq,
                                      state.s, state.x0)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        gss = jax.tree_util.tree_map(lambda t: t[1], flat,
                                     is_leaf=lambda t: isinstance(t, tuple))
        s = jax.tree_util.tree_map(lambda t: t[2], flat,
                                   is_leaf=lambda t: isinstance(t, tuple))
        x0 = jax.tree_util.tree_map(lambda t: t[3], flat,
                                    is_leaf=lambda t: isinstance(t, tuple))
        return updates, MadgradState(count, gss, s, x0)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# Lookahead  ↔ lookahead.py:12-54
# ---------------------------------------------------------------------------

class LookaheadState(NamedTuple):
    base: Any
    slow: Any
    count: chex.Array


def lookahead(base: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """Every ``k`` steps pull the fast weights toward slow weights.

    Matches the reference's lazy slow-buffer init: at the FIRST sync the slow
    buffer is (re)initialized to the current fast weights, so the first sync
    is a no-op on the fast weights (lookahead.py:36-41)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"invalid slow update rate {alpha}")
    if k < 1:
        raise ValueError(f"invalid lookahead steps {k}")

    def init(params):
        return LookaheadState(base.init(params), params,
                              jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        updates, base_state = base.update(grads, state.base, params)
        count = state.count + 1
        sync = (count % k) == 0
        first_sync = count == k

        def one(u, p, slow):
            fast_new = p + u
            slow_tgt = jnp.where(first_sync, fast_new, slow)
            slow_new = slow_tgt + alpha * (fast_new - slow_tgt)
            out_u = jnp.where(sync, slow_new - p, u)
            out_slow = jnp.where(sync, slow_new, slow)
            return out_u, out_slow

        flat = jax.tree_util.tree_map(one, updates, params, state.slow)
        new_updates = jax.tree_util.tree_map(
            lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        new_slow = jax.tree_util.tree_map(
            lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        return new_updates, LookaheadState(base_state, new_slow, count)

    return optax.GradientTransformation(init, update)


# ---------------------------------------------------------------------------
# ViT layer decay  ↔ optim_factory.py:37-63
# ---------------------------------------------------------------------------

def vit_layer_id(path_str: str, num_max_layer: int) -> int:
    """↔ ``get_num_layer_for_vit`` on a flax param path (joined with '.').

    ``encoder.`` prefixes are stripped like the reference strips
    ``module./encoder.``; ``block{i}`` modules map to layer i+1; embedding
    params (cls token/pos, group/patch embed, pos-embed MLP) map to 0;
    everything else (final norm, head) to ``num_max_layer - 1``."""
    name = path_str.replace("encoder.", "")
    if any(key in name for key in ("cls_token", "mask_token", "cls_pos",
                                   "pos_embed", "patch_embed", "GroupEmbed")):
        return 0
    if "rel_pos_bias" in name:
        return num_max_layer - 1
    if name.startswith("block"):
        head = name.split(".")[0]
        digits = "".join(ch for ch in head if ch.isdigit())
        if digits:
            return int(digits) + 1
    return num_max_layer - 1


def scale_by_layer_decay(layer_decay: float, num_layers: int,
                         layer_id_fn: Optional[Callable[[str, int], int]] = None
                         ) -> optax.GradientTransformation:
    """Multiply each param's update by ``layer_decay ** (num_layers+1-id)``
    (↔ ``LayerDecayValueAssigner``, optim_factory.py:55-63).  Stateless: the
    scale is a pure function of the param's tree path."""
    layer_id_fn = layer_id_fn or vit_layer_id
    num_max_layer = num_layers + 2

    def scale_of(path) -> float:
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        lid = layer_id_fn(".".join(parts), num_max_layer)
        return layer_decay ** (num_layers + 1 - lid)

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        out = jax.tree_util.tree_map_with_path(
            lambda path, u: u * scale_of(path), updates)
        return out, state

    return optax.GradientTransformation(init, update)
