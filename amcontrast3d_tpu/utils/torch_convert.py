"""Torch reference checkpoint (.pth) → flax params/batch_stats converter.

The reference workflow loads released torch checkpoints for eval/finetune
(``openpoints/utils/ckpt_util.py:137-183``: unwrap the ``model``/``net``/
``state_dict`` envelope, strip the ``module.`` DDP prefix, strict=False).
This module re-creates that bridge for the TPU rebuild WITHOUT importing the
reference: it maps the reference's *state-dict key structure* (verified
against a live dump of BaseSeg/BaseSeg_AMContrast3D/BaseSeg_M_AMContrast3D)
onto this repo's channels-last flax trees, including the mathematical
reformulation of the fused ``W·[dp; fj]`` local-aggregation conv into the
separable ``w_dp``/``w_f`` Dense pair (models/pointnext.py).

Reference key layout (↔ openpoints/models/backbone/pointnext.py):
  encoder.encoder.{i}.0.convs.0.{conv,bn}          SetAbstraction
    · stage 0 conv is Conv1d (ndim-3 weight)       → enc{i}_sa.ConvBlock_0
    · stage i>0 conv is Conv2d on [dp; fj] (ndim-4)→ enc{i}_sa.{w_dp,w_f}
  encoder.encoder.{i}.{j}.convs.convs.0.*  (j>=1)  → enc{i}_block{j}.LocalAggregation_0
  encoder.encoder.{i}.{j}.pwconv.{k}.*             → enc{i}_block{j}.ConvBlock_{k}
  decoder.decoder.{k}.0.convs.{c}.*                → fp{k}.ConvBlock_{c}
  head.head.{idx}.*   (Dropout holes in idx)       → head.ConvBlock_{n}
  APM.layer_{s}.{idx}.* (Linear/BN1d interleaved)  → APM.layer_{s}.{Dense_k,BatchNorm_k}
  APM.map_{s}.0.*                                  → APM.map_{s}

Tensor conversions: Conv1d/Conv2d (out,in,1[,1]) → Dense kernel (in,out);
Linear (out,in) → (in,out); BN weight/bias/running_mean/running_var →
scale/bias + batch_stats mean/var; num_batches_tracked dropped.
"""
from __future__ import annotations

import logging
import re
from typing import Any, Dict, Tuple

import numpy as np

_ENVELOPES = ("model", "net", "network", "state_dict", "base_model")


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return np.asarray(t.detach().cpu().numpy())


def load_torch_state_dict(path: str) -> Tuple[Dict[str, np.ndarray], Dict]:
    """Load a ``.pth``, unwrap the envelope, strip ``module.`` prefixes.

    Returns ``(flat_state_dict_of_numpy, extras)`` where extras carries the
    sidecar scalars (epoch, best_val, …) the reference checkpoints store.
    """
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    extras = {}
    sd = blob
    if isinstance(blob, dict):
        for key in blob:
            if key in _ENVELOPES:
                sd = blob[key]
                extras = {k: v for k, v in blob.items()
                          if k != key and not hasattr(v, "keys")}
                break
    flat = {k[len("module."):] if k.startswith("module.") else k: _np(v)
            for k, v in sd.items() if hasattr(v, "detach")}
    return flat, extras


def _nest(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        node = tree
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _sorted_int_keys(d: Dict[str, Any]):
    return sorted((k for k in d if k.isdigit()), key=int)


def _dense(conv: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    w = conv["weight"]
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in) ← (out,in,1[,1])
    p = {"kernel": np.ascontiguousarray(w.T)}
    if "bias" in conv:
        p["bias"] = conv["bias"]
    return p


def _bn(bn: Dict[str, np.ndarray]):
    params = {"scale": bn["weight"], "bias": bn["bias"]}
    stats = {"mean": bn["running_mean"], "var": bn["running_var"]}
    return params, stats


def _is_bn(mod: Dict[str, Any]) -> bool:
    return "running_mean" in mod


def _convblock(seq: Dict[str, Any]):
    """A create_convblock Sequential {0: conv, 1: bn?} → flax ConvBlock."""
    params: Dict[str, Any] = {"Dense_0": _dense(seq["0"])}
    stats: Dict[str, Any] = {}
    for idx in _sorted_int_keys(seq):
        if idx != "0" and _is_bn(seq[idx]):
            p, s = _bn(seq[idx])
            params["BatchNorm_0"] = p
            stats["BatchNorm_0"] = s
    return params, stats


def _separable_la(seq: Dict[str, Any]):
    """Fused W·[dp; fj] conv2d block → separable {w_dp, w_f} pair (dp is
    concatenated FIRST in the reference get_aggregation_feautres, so the
    first 3 input rows are the dp half).  Returns (params, stats, unmapped
    key suffixes): the separable Dense pair is bias-free (released configs
    use bias=False with BN), so a bias on the fused conv cannot be mapped —
    it is reported so the drop is loud, never silent."""
    w = seq["0"]["weight"]
    w = w.reshape(w.shape[0], w.shape[1])  # (out, 3 + in)
    params: Dict[str, Any] = {
        "w_dp": {"kernel": np.ascontiguousarray(w[:, :3].T)},
        "w_f": {"kernel": np.ascontiguousarray(w[:, 3:].T)}}
    stats: Dict[str, Any] = {}
    unmapped = ["0.bias"] if seq["0"].get("bias") is not None else []
    for idx in _sorted_int_keys(seq):
        if idx != "0" and _is_bn(seq[idx]):
            p, s = _bn(seq[idx])
            params["BatchNorm_0"] = p
            stats["BatchNorm_0"] = s
    return params, stats, unmapped


def _encoder_tree(enc: Dict[str, Any]):
    params, stats, unmapped = {}, {}, []
    for i in _sorted_int_keys(enc):
        stage = enc[i]
        for j in _sorted_int_keys(stage):
            blk = stage[j]
            if j == "0":  # SetAbstraction
                name = f"enc{i}_sa"
                sa_convs = blk.get("convs", {})
                conv0 = sa_convs.get("0", {})
                # sa_layers>1 checkpoints carry convs.1+ — not mapped (the
                # released AMContrast3D configs all use sa_layers=1); record
                # them so the drop is loud, not silent
                unmapped += [f"encoder.encoder.{i}.0.convs.{c}"
                             for c in _sorted_int_keys(sa_convs) if c != "0"]
                if conv0.get("0", {}).get("weight") is None:
                    unmapped.append(f"encoder.encoder.{i}.0")
                    continue
                if conv0["0"]["weight"].ndim == 3:  # head SA (Conv1d)
                    p, s = _convblock(conv0)
                    params[name] = {"ConvBlock_0": p}
                    if s:
                        stats[name] = {"ConvBlock_0": s}
                else:
                    params[name], stats[name], la_un = _separable_la(conv0)
                    unmapped += [f"encoder.encoder.{i}.0.convs.0.{u}"
                                 for u in la_un]
            else:  # InvResMLP
                bp, bs = {}, {}
                la_convs = blk.get("convs", {}).get("convs", {})
                unmapped += [f"encoder.encoder.{i}.{j}.convs.convs.{c}"
                             for c in _sorted_int_keys(la_convs) if c != "0"]
                la = la_convs.get("0")
                if la is not None:
                    bp["LocalAggregation_0"], bs["LocalAggregation_0"], \
                        la_un = _separable_la(la)
                    unmapped += [
                        f"encoder.encoder.{i}.{j}.convs.convs.0.{u}"
                        for u in la_un]
                for k in _sorted_int_keys(blk.get("pwconv", {})):
                    cp, cs = _convblock(blk["pwconv"][k])
                    bp[f"ConvBlock_{k}"] = cp
                    if cs:
                        bs[f"ConvBlock_{k}"] = cs
                params[f"enc{i}_block{j}"] = bp
                stats[f"enc{i}_block{j}"] = bs
    return params, stats, unmapped


def _decoder_tree(dec: Dict[str, Any]):
    params, stats = {}, {}
    for k in _sorted_int_keys(dec):
        fp = dec[k].get("0", {}).get("convs", {})
        dp, ds = {}, {}
        for c in _sorted_int_keys(fp):
            cp, cs = _convblock(fp[c])
            dp[f"ConvBlock_{c}"] = cp
            if cs:
                ds[f"ConvBlock_{c}"] = cs
        params[f"fp{k}"] = dp
        stats[f"fp{k}"] = ds
    return params, stats


def _head_tree(head: Dict[str, Any]):
    """Sequential with Dropout holes: enumerate present indices in order."""
    params, stats = {}, {}
    for n, idx in enumerate(_sorted_int_keys(head)):
        cp, cs = _convblock(head[idx])
        params[f"ConvBlock_{n}"] = cp
        if cs:
            stats[f"ConvBlock_{n}"] = cs
    return params, stats


def _apm_tree(apm: Dict[str, Any]):
    """APM_* towers: layer_{s} Sequential of Linear/BN1d; map_{s} Linear."""
    params, stats = {}, {}
    for key in sorted(apm):
        m = re.fullmatch(r"layer_(\d+)", key)
        if m:
            tp, ts = {}, {}
            k_lin = k_bn = 0
            for idx in _sorted_int_keys(apm[key]):
                mod = apm[key][idx]
                if _is_bn(mod):
                    p, s = _bn(mod)
                    tp[f"BatchNorm_{k_bn}"] = p
                    ts[f"BatchNorm_{k_bn}"] = s
                    k_bn += 1
                elif "weight" in mod and mod["weight"].ndim == 2:
                    tp[f"Dense_{k_lin}"] = {
                        "kernel": np.ascontiguousarray(mod["weight"].T),
                        "bias": mod["bias"]}
                    k_lin += 1
            params[key] = tp
            stats[key] = ts
        m = re.fullmatch(r"map_(\d+)", key)
        if m:
            lin = apm[key].get("0", apm[key])
            if "weight" in lin:
                params[key] = {
                    "kernel": np.ascontiguousarray(lin["weight"].T),
                    "bias": lin["bias"]}
    return params, stats


def convert_state_dict(flat: Dict[str, np.ndarray]):
    """Flat reference state dict → ``{"params":…, "batch_stats":…}``.

    Unknown top-level groups are reported (and skipped) rather than fatal —
    mirrors the reference's strict=False contract.  The result is meant for
    the tolerant loader (utils/ckpt.load_checkpoint's merge), which keeps
    template leaves for anything missing here.
    """
    tree = _nest(flat)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    unmapped = []
    for group, sub in tree.items():
        if group == "encoder" and "encoder" in sub:
            p, s, miss = _encoder_tree(sub["encoder"])
            params["encoder"] = p
            stats["encoder"] = s
            unmapped += miss
        elif group == "decoder" and "decoder" in sub:
            params["decoder"], stats["decoder"] = _decoder_tree(
                sub["decoder"])
        elif group == "head" and "head" in sub:
            params["head"], stats["head"] = _head_tree(sub["head"])
        elif group == "APM":
            params["APM"], stats["APM"] = _apm_tree(sub)
        else:
            unmapped.append(group)
    if unmapped:
        logging.warning("convert_state_dict: UNMAPPED reference entries "
                        "(kept from init — check the model config matches "
                        "the checkpoint): %s", unmapped)
    return {"params": params, "batch_stats": stats}


def convert_torch_checkpoint(path: str):
    """One call: .pth file → ``({"params","batch_stats"}, extras)``."""
    flat, extras = load_torch_state_dict(path)
    return convert_state_dict(flat), extras
