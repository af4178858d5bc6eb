"""Optimizer factory over optax (↔ openpoints/optim/optim_factory.py:66-200).

Reference semantics reproduced:

* weight-decay filtering — no decay on biases and 1-d (norm) parameters
  (``add_weight_decay``, optim_factory.py:66-81) via an optax mask;
* name table covering the reference's custom implementations with their optax
  equivalents, plus TPU-native re-implementations of the reference's vendored
  optimizers (adamp/sgdp/madgrad/lookahead — :mod:`optim.extras`);
* ``lookahead_<name>`` prefix wraps any base optimizer
  (optim_factory.py:302-304);
* ``layer_decay`` cfg key applies ViT per-layer LR scales
  (optim_factory.py:177-186).

``adahessian`` (second-order, Hutchinson Hessian traces) lives in
:mod:`optim.adahessian`: the update rule is an optax extra-args transform fed
the per-step Hutchinson diagonal (one ``jax.jvp`` through the gradient
function inside the same jitted step), wired by ``engine/train.py`` when the
config names it.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax.numpy as jnp
import optax

from .adahessian import adahessian, hutchinson_diag
from .extras import (adamp, lookahead, madgrad, scale_by_layer_decay, sgdp,
                     vit_layer_id)


def _decay_mask(params) -> Any:
    """True (apply weight decay) only for parameters with ndim > 1."""
    import jax
    return jax.tree_util.tree_map(lambda p: jnp.ndim(p) > 1, params)


def build_optimizer_from_cfg(cfg, lr: Optional[Callable] = None,
                             **kwargs) -> optax.GradientTransformation:
    """cfg keys: NAME, weight_decay, momentum, betas/opt_betas, eps...

    ``lr`` may be a float or an optax schedule (callable step → lr).
    """
    cfg = dict(cfg) if cfg is not None else {}
    cfg.update(kwargs)
    name = str(cfg.get("NAME", "adamw")).lower()
    weight_decay = float(cfg.get("weight_decay", 0.0) or 0.0)
    momentum = float(cfg.get("momentum", 0.9) or 0.9)
    eps = float(cfg.get("eps", 1e-8) or 1e-8)
    betas = cfg.get("betas", cfg.get("opt_betas", None))
    b1, b2 = (betas if betas is not None else (0.9, 0.999))
    if lr is None:
        lr = float(cfg.get("lr", 1e-3))

    # lookahead_<base> wraps the base optimizer (optim_factory.py:302-304)
    if name.startswith("lookahead_"):
        base_cfg = dict(cfg)
        base_cfg["NAME"] = name[len("lookahead_"):]
        base = build_optimizer_from_cfg(base_cfg, lr=lr)
        return lookahead(base, alpha=float(cfg.get("lookahead_alpha", 0.5)),
                         k=int(cfg.get("lookahead_k", 6)))

    layer_decay = float(cfg.get("layer_decay", 0.0) or 0.0)
    if 0.0 < layer_decay < 1.0:
        base_cfg = {k: v for k, v in cfg.items() if k != "layer_decay"}
        base = build_optimizer_from_cfg(base_cfg, lr=lr)
        num_layers = int(cfg.get("num_layers", 12))
        return optax.chain(base, scale_by_layer_decay(layer_decay, num_layers))

    mask = _decay_mask
    if name in ("adamw",):
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps,
                           weight_decay=weight_decay, mask=mask)
    if name in ("adam",):
        tx = optax.adam(lr, b1=b1, b2=b2, eps=eps)
    elif name in ("sgd", "momentum"):
        tx = optax.sgd(lr, momentum=momentum, nesterov=cfg.get("nesterov", True))
    elif name == "radam":
        tx = optax.radam(lr, b1=b1, b2=b2, eps=eps)
    elif name == "adabelief":
        tx = optax.adabelief(lr, b1=b1, b2=b2, eps=eps)
    elif name == "adafactor":
        return optax.adafactor(lr, weight_decay_rate=weight_decay or None)
    elif name == "lamb":
        return optax.lamb(lr, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay, mask=mask)
    elif name == "lars":
        return optax.lars(lr, weight_decay=weight_decay,
                          weight_decay_mask=mask, momentum=momentum)
    elif name in ("nadam", "nadamw"):
        tx = optax.nadam(lr, b1=b1, b2=b2, eps=eps)
    elif name in ("novograd", "nvnovograd"):
        tx = optax.novograd(lr, b1=b1, b2=b2, eps=eps,
                            weight_decay=weight_decay)
        return tx
    elif name in ("rmsprop", "rmsprop_tf"):
        tx = optax.rmsprop(lr, decay=cfg.get("alpha", 0.9), eps=eps,
                           momentum=momentum)
    elif name == "lion":
        return optax.lion(lr, weight_decay=weight_decay, mask=mask)
    elif name == "adamp":
        # reference factory forces wd_ratio=0.01, nesterov=True
        # (optim_factory.py:232)
        return adamp(lr, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay,
                     delta=float(cfg.get("delta", 0.1)),
                     wd_ratio=float(cfg.get("wd_ratio", 0.01)),
                     nesterov=bool(cfg.get("nesterov", True)))
    elif name == "sgdp":
        # reference factory forces nesterov=True (optim_factory.py:224)
        return sgdp(lr, momentum=momentum,
                    dampening=float(cfg.get("dampening", 0.0)),
                    weight_decay=weight_decay,
                    nesterov=bool(cfg.get("nesterov", True)), eps=eps,
                    delta=float(cfg.get("delta", 0.1)),
                    wd_ratio=float(cfg.get("wd_ratio", 0.1)))
    elif name in ("madgrad", "madgradw"):
        return madgrad(lr, momentum=momentum, weight_decay=weight_decay,
                       eps=float(cfg.get("eps", 1e-6) if "eps" in cfg else 1e-6),
                       decoupled_decay=name == "madgradw")
    elif name == "adahessian":
        return adahessian(lr, b1=b1, b2=b2, eps=eps,
                          weight_decay=weight_decay,
                          hessian_power=float(cfg.get("hessian_power", 1.0)),
                          mask=mask)
    else:
        raise ValueError(
            f"optimizer {name} is not supported on the TPU stack "
            f"(reference optim_factory names map to optax)")
    if weight_decay:
        # coupled L2 (wd·param added to the gradient) — what torch does for
        # sgd/adam-style optimizers, with the reference's bias/norm filtering
        tx = optax.chain(optax.add_decayed_weights(weight_decay, mask=mask), tx)
    return tx
