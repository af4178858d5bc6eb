"""3-NN inverse-distance feature interpolation (decoder upsampling).

↔ ``three_nn`` / ``three_interpolate`` / ``three_interpolation``
(``models/layers/upsampling.py:11-103``): weights are the normalized
reciprocal of the *unsquared* distance ``1/(√d²+1e-8)``.  The hand-written
CUDA backward (scatter-add into the coarse features) is what XLA autodiff
produces for the gather formulation, so no custom VJP is needed.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .knn import knn
from .group import group_points


def three_nn(unknown: jnp.ndarray, known: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """unknown: (B, N, 3), known: (B, M, 3) → (dist (B,N,3) L2, idx (B,N,3))."""
    idx, d2 = knn(known, unknown, 3)
    return jnp.sqrt(jnp.maximum(d2, 0.0)), idx


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """features: (B, M, C), idx/weight: (B, N, 3) → (B, N, C)."""
    neigh = group_points(features, idx)  # (B, N, 3, C)
    return jnp.sum(neigh * weight[..., None], axis=2)


def _use_fused_interp() -> bool:
    import os

    import jax

    from .knn import _use_approx
    return (jax.default_backend() == "tpu" and _use_approx()
            and os.environ.get("AMC3D_FUSED_CONTRAST", "auto") != "off")


def three_interpolation(unknown_xyz: jnp.ndarray, known_xyz: jnp.ndarray,
                        known_feat: jnp.ndarray) -> jnp.ndarray:
    """Interpolate coarse features onto fine positions (upsampling.py:92-103).

    On TPU (non-exact mode) this dispatches to the fused Pallas kernel —
    threshold 3-NN + one matmul per tile, matmul VJP, no gather/scatter
    (ops/interpolate_pallas.py)."""
    if _use_fused_interp():
        from .interpolate_pallas import three_interpolation_fused
        return three_interpolation_fused(unknown_xyz, known_xyz, known_feat)
    dist, idx = three_nn(unknown_xyz, known_xyz)
    dist_recip = 1.0 / (dist + 1e-8)
    norm = jnp.sum(dist_recip, axis=2, keepdims=True)
    weight = dist_recip / norm
    return three_interpolate(known_feat, idx, weight)
