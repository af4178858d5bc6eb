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


def load_checkpoint(template_state: Dict[str, Any], pretrained_path: str) -> Dict[str, Any]:
    """Load a checkpoint into the structure of ``template_state``.

    Tolerant load (reference ``load_checkpoint`` ckpt_util.py:137-183): the
    template provides the pytree structure; the stored msgpack is restored
    onto it.  Returns ``(state, epoch, extras)``.
    """
    if not os.path.exists(pretrained_path):
        raise FileNotFoundError(pretrained_path)
    with open(pretrained_path, "rb") as f:
        blob = pickle.load(f)
    state = serialization.from_bytes(_to_host(template_state), blob["state"])
    extras = {k: v for k, v in blob.items() if k not in ("state",)}
    logging.info("Loaded checkpoint %s (epoch %s)", pretrained_path, extras.get("epoch"))
    return state, extras.get("epoch", 0), extras


def resume_checkpoint(cfg, template_state: Dict[str, Any]):
    """Resume training: restore state and set ``cfg.start_epoch = epoch + 1``."""
    pretrained_path = cfg.pretrained_path
    state, epoch, extras = load_checkpoint(template_state, pretrained_path)
    cfg.start_epoch = int(epoch) + 1
    logging.info("Resume from %s @ epoch %d", pretrained_path, epoch)
    return state, extras
