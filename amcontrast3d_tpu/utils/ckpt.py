"""Checkpoint save / load / resume with latest+best semantics.

Reproduces the contract of ``openpoints/utils/ckpt_util.py:61-183`` on JAX
pytrees: every epoch a ``<run>_ckpt_latest`` checkpoint (model params, batch
stats, optimizer state, epoch, best_val), copied to ``<run>_ckpt_best`` on a
new best validation mIoU, optional per-``save_freq`` milestone copies.

Serialization uses Flax msgpack (``flax.serialization``) — a single portable
file per checkpoint, no torch involved.
"""
from __future__ import annotations

import logging
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(cfg, state: Dict[str, Any], epoch: int,
                    additioanl_dict: Optional[Dict] = None,
                    is_best: bool = False,
                    post_fix: str = "ckpt_latest",
                    save_name: Optional[str] = None) -> str:
    """``state`` is a dict of pytrees, e.g. {'params':…, 'batch_stats':…, 'opt_state':…}."""
    if save_name is None:
        save_name = cfg.run_name
    payload = {"state": _to_host(state), "epoch": int(epoch)}
    if additioanl_dict is not None:
        payload.update(additioanl_dict)
    path = os.path.join(cfg.ckpt_dir, f"{save_name}_{post_fix}.ckpt")
    with open(path, "wb") as f:
        pickle.dump({"epoch": payload["epoch"],
                     **{k: v for k, v in payload.items() if k not in ("state", "epoch")},
                     "state": serialization.to_bytes(payload["state"])}, f)
    if is_best:
        shutil.copyfile(path, os.path.join(cfg.ckpt_dir, f"{save_name}_ckpt_best.ckpt"))
        logging.info("Found the best model and saved in %s", cfg.ckpt_dir)
    save_freq = cfg.get("save_freq", -1) if hasattr(cfg, "get") else -1
    if save_freq is not None and save_freq > 0 and epoch % save_freq == 0:
        shutil.copyfile(path, os.path.join(cfg.ckpt_dir, f"{save_name}_E{epoch}.ckpt"))
    return path


def _merge_state_dicts(dst, src, prefix, missing, unexpected):
    """strict=False merge (↔ ckpt_util.py:137-183): keep ``dst``'s structure,
    take matching-shape leaves from ``src``, record mismatches."""
    if not isinstance(dst, dict):
        if src is None:
            missing.append(prefix)
            return dst
        if np.shape(src) != np.shape(dst):
            missing.append(f"{prefix} (shape {np.shape(src)} vs {np.shape(dst)})")
            return dst
        return np.asarray(src)
    src = src if isinstance(src, dict) else {}
    for k in src:
        if k not in dst:
            unexpected.append(f"{prefix}/{k}")
    return {k: _merge_state_dicts(v, src.get(k), f"{prefix}/{k}",
                                  missing, unexpected)
            for k, v in dst.items()}


def load_checkpoint(template_state: Dict[str, Any], pretrained_path: str,
                    module: Optional[str] = None) -> Dict[str, Any]:
    """Load a checkpoint into the structure of ``template_state``.

    Tolerant load (reference ``load_checkpoint`` ckpt_util.py:137-183,
    strict=False + optional submodule filter): the template provides the
    pytree structure; the stored msgpack is restored onto it.  With
    ``module`` (e.g. ``"encoder"``) only that top-level subtree of
    ``params``/``batch_stats`` is taken from the checkpoint — the
    encoder-only finetune path (``main_AA.py:229-232``).
    Returns ``(state, epoch, extras)``.
    """
    if not os.path.exists(pretrained_path):
        raise FileNotFoundError(pretrained_path)
    if pretrained_path.endswith((".pth", ".pt")):
        # a torch reference checkpoint (released .pth): convert the state
        # dict to the flax tree and tolerant-merge it onto the template —
        # the reference's own eval/finetune bridge (ckpt_util.py:137-183)
        from .torch_convert import convert_torch_checkpoint
        converted, extras = convert_torch_checkpoint(pretrained_path)
        template = _to_host(template_state)
        state = dict(template)
        missing, unexpected = [], []
        for key in ("params", "batch_stats"):
            if key in template:
                src = converted.get(key)
                if module is not None and isinstance(src, dict):
                    src = {module: src.get(module)}
                state[key] = _merge_state_dicts(template[key], src, key,
                                                missing, unexpected)
        if missing:
            logging.info("torch ckpt keys kept from init (%d): %s ...",
                         len(missing), missing[:5])
        if unexpected:
            logging.info("torch ckpt keys unused (%d): %s ...",
                         len(unexpected), unexpected[:5])
        logging.info("Converted torch checkpoint %s (epoch %s, module=%s)",
                     pretrained_path, extras.get("epoch"), module)
        return state, extras.get("epoch", 0), extras
    with open(pretrained_path, "rb") as f:
        blob = pickle.load(f)
    extras = {k: v for k, v in blob.items() if k not in ("state",)}
    template = _to_host(template_state)
    if module is None:
        try:
            state = serialization.from_bytes(template, blob["state"])
            logging.info("Loaded checkpoint %s (epoch %s)", pretrained_path,
                         extras.get("epoch"))
            return state, extras.get("epoch", 0), extras
        except (ValueError, KeyError):
            pass  # structure mismatch → tolerant merge below
    raw = serialization.msgpack_restore(blob["state"])
    state = dict(template)
    missing, unexpected = [], []
    for key, dst in template.items():
        src = raw.get(key)
        if key in ("params", "batch_stats") and isinstance(dst, dict):
            if module is not None and isinstance(src, dict):
                src = {module: src.get(module)}
            state[key] = _merge_state_dicts(dst, src, key, missing, unexpected)
        elif src is not None:
            try:
                state[key] = serialization.from_state_dict(dst, src)
            except (ValueError, KeyError):
                missing.append(key)
    if missing:
        logging.info("checkpoint keys kept from init (%d): %s ...",
                     len(missing), missing[:5])
    if unexpected:
        logging.info("checkpoint keys unused (%d): %s ...",
                     len(unexpected), unexpected[:5])
    logging.info("Loaded checkpoint %s (epoch %s, module=%s)",
                 pretrained_path, extras.get("epoch"), module)
    return state, extras.get("epoch", 0), extras


def resume_checkpoint(cfg, template_state: Dict[str, Any]):
    """Resume training: restore state and set ``cfg.start_epoch = epoch + 1``."""
    pretrained_path = cfg.pretrained_path
    state, epoch, extras = load_checkpoint(template_state, pretrained_path)
    cfg.start_epoch = int(epoch) + 1
    logging.info("Resume from %s @ epoch %d", pretrained_path, epoch)
    return state, extras
