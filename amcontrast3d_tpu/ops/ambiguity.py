"""Ambiguity Estimation Framework (AEF) core — vectorized.

↔ ``openpoints/AMContrast3D/AEF/ambiguity.py:11-93`` and
``AEF/function.py:10-14``.  The reference builds the boundary-point
neighborhood matrix with a Python ``for`` loop over boundary points
(``ambiguity.py:28-52``); here everything is computed for *all* points with
masks — fixed shapes, one fused XLA graph, no data-dependent gathers:

* ``mask_num = Σ posmask``; ``maxc = max(mask_num)`` over every point in the
  batch (the reference takes the max over the flattened batch, not the
  constant ``nsample`` — reproduced exactly);
* hard ambiguity ``|mask_num − maxc| / maxc`` ∈ {0 … 1};
* boundary points (0 < mask_num < maxc) get the soft value
  ``σ⁻(cc⁺ − cc⁻) = 1 / (1 + e^(β·(cc⁺−cc⁻)))`` with class compactness
  ``cc± = n± / d±`` where d± sums squared (Method2) / rooted (Method3) /
  constant-5 (Method1) neighbor distances.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12  # AEF/function.py:8


def ambiguity_from_stats(n_pos: jnp.ndarray, n_neg: jnp.ndarray,
                         d_pos: jnp.ndarray, d_neg: jnp.ndarray,
                         ccbeta: float = 0.04,
                         method1: bool = False,
                         k_cap: float = None) -> jnp.ndarray:
    """Ambiguity from pre-reduced neighborhood statistics.

    n_pos/n_neg: (...,) same-/different-label neighbor counts;
    d_pos/d_neg: (...,) summed (already squared/rooted per cctype) distances
    to those neighbors.  Used directly by the fused contrast kernel
    (ops/contrast_pallas.py), and by :func:`ambiguity_function` after it
    reduces the (…, K) masks.

    k_cap: when the stats come from *threshold* neighborhoods (the fused
    selfk kernel — exact-or-superset sets), pass the reference's K-slot
    size ``nsample - 1``.  Counts are clamped to the K-slot semantics
    (``n_pos ≤ K``, ``n_pos + n_neg = K``): a single superset point would
    otherwise push the batch-global ``maxc`` above K and reclassify every
    true interior point (n_pos == K < maxc) as boundary, silently
    shrinking the loss-mean denominator's complement (the d sums need no
    rescaling — boundary classification depends only on counts).
    """
    if k_cap is not None:
        n_pos = jnp.minimum(n_pos, k_cap)
        n_neg = k_cap - n_pos
    mask_num = n_pos
    maxc = jnp.maximum(jnp.max(mask_num), 1.0)           # global max, ≥1
    a_hard = jnp.abs(mask_num - maxc) / maxc
    boundary = jnp.logical_and(mask_num > 0, mask_num < maxc)

    if method1:
        d_pos = jnp.full_like(n_pos, 5.0)
        d_neg = jnp.full_like(n_neg, 5.0)

    # Guard zero denominators (only hit at non-boundary points, whose value
    # is overwritten by a_hard below) to keep the graph NaN-free.
    cc_pos = n_pos / jnp.maximum(d_pos, _EPS)
    cc_neg = n_neg / jnp.maximum(d_neg, _EPS)
    a_soft = 1.0 / (1.0 + jnp.exp(ccbeta * (cc_pos - cc_neg)))  # function.py:10-14, t=e

    return jnp.where(boundary, a_soft, a_hard).astype(jnp.float32)


def ambiguity_function(posmask: jnp.ndarray, dd: jnp.ndarray,
                       cctype: str = "Method2", ccbeta: float = 0.04
                       ) -> jnp.ndarray:
    """Per-point soft ambiguity ``a ∈ [0, 1]``.

    Args:
      posmask: (..., K) bool — neighbor-has-same-label mask (self excluded).
      dd: (..., K) float — *squared* distance to each of the K neighbors.
      cctype: 'Method1' (d=5 const) | 'Method2' (squared) | 'Method3' (rooted).
      ccbeta: β of the inverse sigmoid.
    Returns:
      a: (...,) float32.
    """
    K = posmask.shape[-1]
    pm = posmask.astype(jnp.float32)
    mask_num = jnp.sum(pm, axis=-1)                      # (...,)
    n_pos = mask_num
    n_neg = K - mask_num

    if cctype == "Method1":
        d_pos = d_neg = jnp.zeros_like(n_pos)
    elif cctype == "Method2":
        d_pos = jnp.sum(pm * dd, axis=-1)
        d_neg = jnp.sum((1.0 - pm) * dd, axis=-1)
    elif cctype == "Method3":
        dr = jnp.sqrt(jnp.abs(dd) + _EPS)
        d_pos = jnp.sum(pm * dr, axis=-1)
        d_neg = jnp.sum((1.0 - pm) * dr, axis=-1)
    else:
        raise ValueError(f"unknown cctype {cctype}")

    return ambiguity_from_stats(n_pos, n_neg, d_pos, d_neg, ccbeta,
                                method1=cctype == "Method1")


def ambiguity_histogram(a: jnp.ndarray, nu: float,
                        valid: jnp.ndarray = None) -> jnp.ndarray:
    """5-bucket {0, low, ν, high, 1} percentage histogram (ambiguity.py:77-93)."""
    nu_m = nu * 10.0
    ceil10 = jnp.ceil(a * 10.0)
    b0 = a == 0
    blow = jnp.logical_and(ceil10 > 0, ceil10 < nu_m)
    bsemi = ceil10 == nu_m
    bhigh = jnp.logical_and(ceil10 > nu_m, ceil10 < 10)
    b1 = ceil10 == 10
    buckets = jnp.stack([b0, blow, bsemi, bhigh, b1]).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        total = jnp.maximum(jnp.sum(v), 1.0)
        return jnp.sum(buckets * v, axis=tuple(range(1, buckets.ndim))) / total * 100.0
    total = a.size
    return jnp.sum(buckets, axis=tuple(range(1, buckets.ndim))) / total * 100.0
