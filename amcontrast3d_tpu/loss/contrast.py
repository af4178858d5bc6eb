"""Adaptive-margin contrastive loss (ContrastHead) and AEF AmbiguityHead.

↔ ``openpoints/AMContrast3D/MarginContrast.py:15-273``.  The reference gathers
the data-dependent subset of boundary points (``point_mask_smallai``,
MarginContrast.py:250-254) before computing the loss; XLA needs fixed shapes,
so the loss is computed for every point and reduced with a validity weight —
mathematically identical (mean over the selected subset == masked sum /
mask count).

All similarity / margin / decision-boundary / supervised-CL variants of the
reference are implemented and selected by ``ambiguity_args`` exactly as in
the YAML configs.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp

from ..ops import group_points
from .aef import one_hot_labels, stage_neighborhood, subscene_labels

_EPS = 1e-12  # AEF/function.py:8

# Fused Pallas contrast path (ops/contrast_pallas.py): 'auto' uses it on TPU
# for the variants it covers, 'on' forces it (interpret-mode off-TPU, for
# tests), 'off' always uses the XLA gather path.
_FUSED = os.environ.get("AMC3D_FUSED_CONTRAST", "auto")


def set_fused_contrast(mode: str):
    global _FUSED
    assert mode in ("auto", "on", "off")
    _FUSED = mode


def _fused_enabled(args: Dict) -> bool:
    """The shared fused-kernel gate: the env switch, the per-head
    ``ambiguity_args.fused`` opt-out, and the backend check."""
    return (_FUSED != "off" and args.get("fused", True)
            and (_FUSED == "on" or jax.default_backend() == "tpu"))


def _use_fused(args: Dict, dist_func: str, contrast_func: str) -> bool:
    return (_fused_enabled(args)
            and contrast_func == "contrast_softnn_margin"
            and args.get("supervisedCL", "Method1") == "Method1"
            and dist_func in ("dist_cos", "dist_dot")
            and args.get("margin", "adaptive") in
            ("constant", "adaptive", "learned")
            and args.get("db", "-m") in ("-m", "+m", "none"))


# --------------------------------------------------------------------------
# similarity functions (MarginContrast.py:71-108)
# --------------------------------------------------------------------------

def dist_dot(features, neighbor_feature):
    return jnp.sum(features[..., None, :] * neighbor_feature, axis=-1) + _EPS


def dist_cos(features, neighbor_feature):
    f = features[..., None, :]
    num = jnp.sum(f * neighbor_feature, axis=-1)
    denom = (jnp.linalg.norm(f, axis=-1) *
             jnp.linalg.norm(neighbor_feature, axis=-1))
    # torch F.cosine_similarity clamps the denominator at eps=1e-8
    return num / jnp.maximum(denom, 1e-8)


def dist_l2(features, neighbor_feature):
    d = features[..., None, :] - neighbor_feature
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + _EPS)


def dist_kl(features, neighbor_feature):
    """KL(gt=features ‖ pred=neighbors), both log-softmaxed
    (MarginContrast.py:87-108 with normalized=False)."""
    logp = jax.nn.log_softmax(features, axis=-1)[..., None, :]
    logq = jax.nn.log_softmax(neighbor_feature, axis=-1)
    p = jnp.exp(logp)
    return jnp.sum(p * (logp - logq), axis=-1)


_DIST_FUNCS = {"dist_dot": dist_dot, "dist_cos": dist_cos,
               "dist_l2": dist_l2, "dist_kl": dist_kl}


# --------------------------------------------------------------------------
# contrast objectives (MarginContrast.py:117-217)
# --------------------------------------------------------------------------

def contrast_softnn_margin(dist, posmask, ambiguity, args):
    """Margin-adjusted soft-NN ratio loss (MarginContrast.py:117-174).

    dist/posmask: (..., K); ambiguity: (...,).  Returns per-point loss (...,).
    """
    pm = posmask.astype(dist.dtype)
    margin_mode = args.get("margin", "adaptive")
    if margin_mode == "constant":
        margin = args["nu"]
    elif margin_mode == "adaptive":
        margin = args["mu"] * ambiguity[..., None] + args["nu"]
    elif margin_mode == "learned":
        u = jnp.mean(dist * (1.0 - pm), axis=-1)
        v = jnp.mean(dist * pm, axis=-1)
        margin = (u[..., None] - 1.0) * ambiguity[..., None] + v[..., None]
    else:
        raise ValueError(f"margin {margin_mode}")

    db = args.get("db", "-m")
    if db == "-m":
        dist = (dist - margin) * pm + dist * (1.0 - pm)
    elif db == "+m":
        dist = dist * pm + (dist + margin) * (1.0 - pm)

    temperature = args.get("temperature", None)
    if temperature is not None:
        dist = dist / temperature
    exp = jnp.exp(dist)

    pos = jnp.sum(exp * pm, axis=-1)
    neg = jnp.sum(exp * (1.0 - pm), axis=-1)
    pos_neg = jnp.sum(exp, axis=-1)

    method = args.get("supervisedCL", "Method1")
    if method == "Method1":
        loss = pos / pos_neg + _EPS
    elif method == "Method2":
        pos_ij = exp * pm
        ratio = pos_ij / (pos_ij + neg[..., None]) + _EPS
        pos_num = jnp.sum(pm, axis=-1) + _EPS
        loss = jnp.sum(ratio, axis=-1) / pos_num
    else:
        raise ValueError(f"supervisedCL {method}")
    return -jnp.log(loss)


def contrast_softnn_temperature(dist, posmask, ambiguity, args):
    """Dynamic-temperature variant (MarginContrast.py:177-196), for distance
    (not similarity) metrics."""
    pm = posmask.astype(dist.dtype)
    dist = -dist
    dist = dist - jnp.max(dist, axis=-1, keepdims=True)
    temperature = args.get("temperature", None)
    if temperature is not None:
        dist = dist / (temperature * (1.5 - ambiguity[..., None]))
    exp = jnp.exp(dist)
    pos = jnp.sum(exp * pm, axis=-1)
    neg = jnp.sum(exp, axis=-1)
    return -jnp.log(pos / neg + _EPS)


def contrast_softnn(dist, posmask, temperature=None):
    """Plain soft-NN contrast (MarginContrast.py:199-217)."""
    pm = posmask.astype(dist.dtype)
    dist = -dist
    dist = dist - jnp.max(dist, axis=-1, keepdims=True)
    if temperature is not None:
        dist = dist / temperature
    exp = jnp.exp(dist)
    pos = jnp.sum(exp * pm, axis=-1)
    neg = jnp.sum(exp, axis=-1)
    return -jnp.log(pos / neg + _EPS)


# --------------------------------------------------------------------------
# per-stage heads
# --------------------------------------------------------------------------

def point_contrast_margin_fused(p: jnp.ndarray, f: jnp.ndarray,
                                labels_stage: jnp.ndarray, args: Dict,
                                dist_func: str = "dist_cos"
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused-kernel stage contrast (↔ MarginContrast.py:220-259 for the
    softnn-margin/Method1 family): the kNN supplies only the k-th-nearest
    distance threshold; neighbor membership, similarities, the exp sums and
    the ambiguity statistics all come from one dense Pallas kernel with a
    matmul-only VJP (ops/contrast_pallas.py) — no (B, N, K, C) gather, no
    backward scatter."""
    from ..ops import (ambiguity_from_stats, contrast_reductions,
                       contrast_reductions_selfk, knn)
    from ..ops.knn import _use_approx

    nsample = args["nsample"]
    # labels_stage: (B, N, ncls) soft one-hot, or already-argmaxed (B, N)
    # int class ids (the label_vote kernel path in contrast_head)
    if labels_stage.ndim == 2:
        lab = labels_stage.astype(jnp.float32)
    else:
        lab = jnp.argmax(labels_stage, axis=-1).astype(jnp.float32)
    temperature = args.get("temperature", None)
    tinv = 1.0 / float(temperature) if temperature else 1.0
    cctype = args.get("cctype", "Method2")
    margin_mode = args.get("margin", "adaptive")
    need_s = margin_mode == "learned"
    need_d = cctype != "Method1"

    if dist_func == "dist_cos":
        # per-vector normalization; the reference clamps the norm *product*
        # at 1e-8 (torch cosine_similarity) — differs only for degenerate
        # near-zero features (docs/DEVIATIONS.md)
        norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
        fsim = f / jnp.maximum(norm, 1e-8)
    else:  # dist_dot (the reference's +1e-12 shift cancels in the ratio)
        fsim = f

    interpret = jax.default_backend() != "tpu"
    if _use_approx():
        # fully fused: the kernel's own value-only selection pass supplies
        # the k-th-distance threshold (exact-or-superset neighborhoods) —
        # no separate kNN runs for the loss at all
        red = contrast_reductions_selfk(
            p, fsim, lab, nsample, tinv, cctype == "Method3", interpret,
            args.get("fused_precision"), need_s, need_d)
    else:
        # exact backend: threshold from the exact kNN's neighbor set,
        # re-derived in the kernel's own (q−s)² broadcast arithmetic (the
        # kNN's matmul-form d² rounds differently and would flip the k-th
        # point's own membership ~50% of the time); the relative cushion
        # absorbs FMA-vs-VPU ulp differences
        idx, _ = knn(p, p, nsample)
        neigh_xyz = group_points(p, idx)                   # (B, N, k, 3)
        kth = jnp.max(jnp.sum((p[:, :, None, :] - neigh_xyz) ** 2, axis=-1),
                      axis=-1) * (1.0 + 1e-5)
        kth = jax.lax.stop_gradient(kth)
        red = contrast_reductions(p, fsim, lab, kth, tinv,
                                  cctype == "Method3", interpret,
                                  args.get("fused_precision"), need_s, need_d)
    # under ambiguity_args.remat the (B, N, 9) reductions are saved so the
    # backward never re-runs the selection pass
    red = checkpoint_name(red, "contrast_knn")
    P, Q = red[..., 0], red[..., 1]
    s_pos, s_neg = red[..., 2], red[..., 3]
    n_pos, n_neg = red[..., 4], red[..., 5]
    d_pos, d_neg = red[..., 6], red[..., 7]

    # threshold neighborhoods are exact-or-superset: clamp to the reference's
    # K-slot semantics so one superset point can't inflate the global maxc
    # and flip every interior point to boundary (ops/ambiguity.py k_cap doc)
    a = ambiguity_from_stats(n_pos, n_neg, d_pos, d_neg,
                             args.get("ccbeta", 0.04),
                             method1=cctype == "Method1",
                             k_cap=float(nsample - 1))
    a = jax.lax.stop_gradient(a)

    margin_mode = args.get("margin", "adaptive")
    if margin_mode == "constant":
        margin = jnp.full_like(a, args["nu"])
    elif margin_mode == "adaptive":
        margin = args["mu"] * a + args["nu"]
    else:  # learned (MarginContrast.py:129-133): u/v are means over the K
        # neighbor slots, so the denominator is the constant K
        K = float(nsample - 1)
        u, v = s_neg / K, s_pos / K
        margin = (u - 1.0) * a + v

    # db='-m' subtracts the margin on positive pairs pre-exp — a per-point
    # factor exp(-m/T) on the positive sum (db='+m' likewise on negatives)
    db = args.get("db", "-m")
    pos, neg = P, Q
    if db == "-m":
        pos = P * jnp.exp(-margin * tinv)
    elif db == "+m":
        neg = Q * jnp.exp(margin * tinv)

    per_point = -jnp.log(pos / (pos + neg) + _EPS)
    valid = jnp.logical_and(a > 0, a <= 1).astype(per_point.dtype)
    loss = jnp.sum(per_point * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return loss, a


def point_contrast_margin(p: jnp.ndarray, f: jnp.ndarray,
                          labels_stage: jnp.ndarray, args: Dict,
                          dist_func: str = "dist_cos",
                          contrast_func: str = "contrast_softnn_margin"
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-stage adaptive-margin contrast (MarginContrast.py:220-259).

    p: (B, N_s, 3), f: (B, N_s, C), labels_stage: (B, N_s, ncls).
    Returns (scalar loss, target ambiguity (B, N_s)).
    """
    from ..ops import ambiguity_function  # local import to avoid cycles

    if _use_fused(args, dist_func, contrast_func):
        return point_contrast_margin_fused(p, f, labels_stage, args,
                                           dist_func)

    nsample = args["nsample"]
    idx, posmask, dd = stage_neighborhood(p, labels_stage, nsample)
    # tag the kNN outputs so the remat policy in contrast_head can save
    # them: backward then rematerializes only the (B, N, K, C) neighbor
    # gather + softmax intermediates, never the Pallas kNN itself.
    idx, posmask, dd = checkpoint_name((idx, posmask, dd), "contrast_knn")
    a = ambiguity_function(posmask, dd, args.get("cctype", "Method2"),
                           args.get("ccbeta", 0.04))
    a = jax.lax.stop_gradient(a)

    neighbor_feature = group_points(f, idx)  # (B, N_s, K, C)
    dist = _DIST_FUNCS[dist_func](f, neighbor_feature)

    # boundary + wrong points only: 0 < a ≤ 1 (MarginContrast.py:250)
    valid = jnp.logical_and(a > 0, a <= 1).astype(dist.dtype)

    if contrast_func == "contrast_softnn_margin":
        per_point = contrast_softnn_margin(dist, posmask, a, args)
    elif contrast_func == "contrast_softnn_temperature":
        per_point = contrast_softnn_temperature(dist, posmask, a, args)
    elif contrast_func == "contrast_softnn":
        per_point = contrast_softnn(dist, posmask, args.get("temperature"))
    else:
        raise ValueError(contrast_func)

    loss = jnp.sum(per_point * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    return loss, a


def contrast_head(up_stages: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                  target: jnp.ndarray, num_classes: int,
                  ignore_index: Optional[int], args: Dict
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """ContrastHead.forward (MarginContrast.py:262-273): sum the per-stage
    losses over ``stages_num`` decoder stages.

    up_stages: [(p_s (B,N_s,3), f_s (B,N_s,C))] ordered stage 0 (full res)
    → stage 3; stage 0 positions double as the kNN label-propagation source.
    """
    labels0 = one_hot_labels(target, num_classes, ignore_index)
    p0 = up_stages[0][0]
    pcm = lambda p, f, labels: point_contrast_margin(p, f, labels, args)
    if args.get("remat", False):
        # The (B, N_s, K, C) neighbor-feature gather dominates activation
        # memory at flagship shapes (≈0.5 GB per stage per batch of 4).
        # Rematerializing the contrast head halves loss-side activation
        # memory (enables B=8/chip) at the cost of recomputing the gather
        # + exp in backward; the kNN outputs are saved (see checkpoint_name
        # in point_contrast_margin) so the Pallas kernel runs once.
        pcm = jax.checkpoint(
            pcm,
            policy=jax.checkpoint_policies.save_only_these_names(
                "contrast_knn"))
    # With the fused TPU path and a non-exact backend, stage labels come from
    # the majority-vote kernel (argmax-of-mean-one-hot == majority vote; the
    # loss consumes only the argmax) — no subscene kNN or gathers at all.
    from ..ops.knn import _use_approx
    use_vote = (_use_fused(args, "dist_cos", "contrast_softnn_margin")
                and _use_approx())
    if use_vote:
        from ..ops import label_vote
        lab0 = jnp.argmax(labels0, axis=-1)
        interpret = jax.default_backend() != "tpu"

    loss_sum = 0.0
    target_ai_list: List[jnp.ndarray] = []
    for i in range(int(args.get("stages_num", 4))):
        p, f = up_stages[i]
        if i == 0:
            labels = labels0
        elif use_vote:
            kr = 1
            from .aef import NSTRIDE
            for s in NSTRIDE[:i]:
                kr *= s
            labels = label_vote(p0, lab0, p, kr, labels0.shape[-1],
                                interpret=interpret)
        else:
            labels = subscene_labels(labels0, p0, p, i)
        loss, a = pcm(p, f, labels)
        loss_sum = loss_sum + loss
        target_ai_list.append(a)
    return loss_sum, target_ai_list


def ambiguity_head(up_stages: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                   target: jnp.ndarray, num_classes: int,
                   ignore_index: Optional[int], args: Dict
                   ) -> List[jnp.ndarray]:
    """AmbiguityHead.forward (MarginContrast.py:15-52): GT ambiguity per
    stage, no loss.  On the fused TPU path the per-stage counts/distances
    come from the selection kernel's reductions (no kNN, no gathers; the
    features argument is a dummy 1-wide zero column)."""
    from .aef import stage_ambiguity

    labels0 = one_hot_labels(target, num_classes, ignore_index)
    p0 = up_stages[0][0]
    from ..ops.knn import _use_approx
    fused = _fused_enabled(args) and _use_approx()
    if fused:
        from ..ops import (ambiguity_from_stats, contrast_reductions_selfk,
                           label_vote)
        lab0 = jnp.argmax(labels0, axis=-1)
        interpret = jax.default_backend() != "tpu"
        cctype = args.get("cctype", "Method2")

    out = []
    for i in range(int(args.get("stages_num", 4))):
        p, _ = up_stages[i]
        if fused:
            if i == 0:
                lab = lab0.astype(jnp.float32)
            else:
                kr = 1
                from .aef import NSTRIDE
                for s in NSTRIDE[:i]:
                    kr *= s
                lab = label_vote(p0, lab0, p, kr, labels0.shape[-1],
                                 interpret=interpret).astype(jnp.float32)
            dummy_f = jnp.zeros(p.shape[:2] + (1,), jnp.float32)
            red = contrast_reductions_selfk(
                p, dummy_f, lab, args["nsample"], 1.0,
                cctype == "Method3", interpret, None, False,
                cctype != "Method1")
            a = ambiguity_from_stats(red[..., 4], red[..., 5],
                                     red[..., 6], red[..., 7],
                                     args.get("ccbeta", 0.04),
                                     method1=cctype == "Method1",
                                     k_cap=float(args["nsample"] - 1))
            out.append(jax.lax.stop_gradient(a))
            continue
        labels = subscene_labels(labels0, p0, p, i)
        a, _, _ = stage_ambiguity(p, labels, args["nsample"],
                                  args.get("cctype", "Method2"),
                                  args.get("ccbeta", 0.04))
        out.append(a)
    return out
