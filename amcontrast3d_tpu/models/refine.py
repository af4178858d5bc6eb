"""Masked refinement of high-ambiguity decoder features (AMContrast3D++).

↔ ``openpoints/AMContrast3D/MaskedRefine.py:7-132``.  Functional (no
parameters) so it runs inline in the jitted decoder loop on dense
(B, N, C) tensors:

* CrossMask — for every point, the feature of its minimum-ambiguity kNN
  neighbor (``fusion='MIN'``) or the mean over zero-ambiguity neighbors
  (``'MIN_ALL0'``, reproducing the reference's mean over *all* K slots with
  non-zero-ambiguity features zeroed, MaskedRefine.py:102-108);
* SelfMask — points with ``threshold ≤ a ≤ threshold_max``;
* update ``f_new = f·¬S + Cross·S``, blended ``f ← γ·f_new + (1−γ)·f``;
  returns the refine-rate (% of points updated).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..ops import group_points, knn


def dual_masks(p: jnp.ndarray, f: jnp.ndarray, a: jnp.ndarray,
               nsample_k: int, fusion: str, threshold: float,
               threshold_max: float, gamma: float
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """p: (B, N, 3), f: (B, N, C), a: (B, N) → (refined f, refine rate %).

    Design deviation (documented): the reference flattens the whole batch
    into one cloud before the kNN (MaskedRefine.py:50-52) so neighborhoods
    may cross cloud boundaries; here the kNN is per-cloud.
    """
    from ..loss.contrast import _fused_enabled
    from ..ops.knn import _use_approx
    if (fusion in ("MIN", "MIN_ALL0") and _fused_enabled({})
            and _use_approx()):
        # fully fused path: selection + masked argmin/zero-mask reduction +
        # one matmul in a single Pallas kernel family — no kNN, no gathers
        # (exact-or-superset neighborhoods, argmin ties averaged:
        # DEVIATIONS.md §11)
        import jax
        from ..ops.contrast_pallas import dual_masks_cross
        cross = dual_masks_cross(p, f, a, nsample_k, fusion,
                                 interpret=jax.default_backend() != "tpu")
        self_mask = jnp.logical_and(a >= threshold, a <= threshold_max)
        rate = jnp.mean(self_mask.astype(jnp.float32)) * 100.0
        s = self_mask[..., None].astype(f.dtype)
        f_new = f * (1.0 - s) + cross * s
        return gamma * f_new + (1.0 - gamma) * f, rate

    from ..ops.knn import knn_tolerant
    idx, _ = knn_tolerant(p, p, nsample_k)
    idx = idx[..., 1:]  # drop self-loop (MaskedRefine.py:59-60)
    K = nsample_k - 1
    na = group_points(a[..., None], idx)[..., 0]  # (B, N, K)

    if fusion == "MIN":
        # gather ONE feature row per point (the argmin-ambiguity neighbor)
        # instead of the full (B, N, K, C) neighborhood — K× less HBM
        # traffic forward and backward, identical result
        good = jnp.argmin(na, axis=-1)         # (B, N)
        gidx = jnp.take_along_axis(idx, good[..., None], axis=-1)[..., 0]
        from ..ops import gather_points
        cross = gather_points(f, gidx)         # (B, N, C)
    elif fusion == "MIN_ALL0":
        nf = group_points(f, idx)              # (B, N, K, C)
        zero_mask = (na <= 0).astype(f.dtype)  # ~gt(0)
        cross = jnp.mean(nf * zero_mask[..., None], axis=2)
    else:
        raise ValueError(f"unknown fusion {fusion}")

    self_mask = jnp.logical_and(a >= threshold, a <= threshold_max)
    rate = jnp.mean(self_mask.astype(jnp.float32)) * 100.0

    s = self_mask[..., None].astype(f.dtype)
    f_new = f * (1.0 - s) + cross * s
    f = gamma * f_new + (1.0 - gamma) * f
    return f, rate


def map_sum(f: jnp.ndarray, a_map: jnp.ndarray) -> jnp.ndarray:
    """f + a_map (MaskedRefine.py:33-37)."""
    return f + a_map


def map_multiply(f: jnp.ndarray, a_map: jnp.ndarray) -> jnp.ndarray:
    """f ⊙ a_map (MaskedRefine.py:39-43)."""
    return f * a_map


def multiply(f: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """f ⊙ a (MaskedRefine.py:45-47)."""
    return f * a[..., None]


def consistency_regularization(e1: jnp.ndarray, e2: jnp.ndarray) -> jnp.ndarray:
    """Jensen–Shannon divergence (MaskedRefine.py:122-132, unused in training)."""
    import jax.nn as jnn
    p1 = jnn.softmax(e1, axis=0)
    p2 = jnn.softmax(e2, axis=0)
    m = 0.5 * (p1 + p2)
    lp1 = jnn.log_softmax(e1, axis=0)
    lp2 = jnn.log_softmax(e2, axis=0)
    kl1 = jnp.sum(m * (jnp.log(jnp.maximum(m, 1e-12)) - lp1)) / e1.shape[0]
    kl2 = jnp.sum(m * (jnp.log(jnp.maximum(m, 1e-12)) - lp2)) / e2.shape[0]
    return 0.5 * (kl1 + kl2)
