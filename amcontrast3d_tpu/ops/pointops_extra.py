"""Remaining pointops surface: subtraction / aggregation / k-NN interpolation.

↔ ``cpp/pointops/functions/pointops.py:181-305`` (Point-Transformer-style
vector-attention primitives over the packed (n, c) layout; unused by the
AMContrast3D segmentation path but part of the op library).  Autodiff
provides the hand-written scatter backwards.
"""
from __future__ import annotations

import jax.numpy as jnp

from .knn import knn_flat


def subtraction(input1: jnp.ndarray, input2: jnp.ndarray,
                idx: jnp.ndarray) -> jnp.ndarray:
    """r[i, k, c] = input1[i, c] − input2[idx[i, k], c]  (pointops.py:181-212)."""
    return input1[:, None, :] - input2[idx]


def aggregation(inp: jnp.ndarray, position: jnp.ndarray, weight: jnp.ndarray,
                idx: jnp.ndarray) -> jnp.ndarray:
    """out[i, c] = Σ_k (inp[idx[i,k], c] + position[i,k,c]) · w[i,k,c//share]
    with channel sharing share = c / w_c (pointops.py:215-248)."""
    n, nsample, c = position.shape
    w_c = weight.shape[-1]
    share = c // w_c
    gathered = inp[idx] + position                     # (n, k, c)
    w = jnp.repeat(weight, share, axis=-1)             # (n, k, c)
    return jnp.sum(gathered * w, axis=1)


def interpolation(xyz: jnp.ndarray, new_xyz: jnp.ndarray, feat: jnp.ndarray,
                  k: int = 3) -> jnp.ndarray:
    """Inverse-distance k-NN interpolation on flat clouds
    (pointops.py:251-305; the reference's dist is the sqrt of d²)."""
    idx, d2 = knn_flat(xyz, new_xyz, k)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    dist_recip = 1.0 / (dist + 1e-8)
    norm = jnp.sum(dist_recip, axis=1, keepdims=True)
    weight = dist_recip / norm
    return jnp.sum(feat[idx] * weight[..., None], axis=1)


interpolation2 = interpolation  # autodiff covers the custom backward
