"""Chamfer distance (bidirectional nearest-neighbor loss).

↔ ``cpp/chamfer_dist/chamfer.cu`` + ``cpp/chamfer_dist/__init__.py:1-85``
(``ChamferFunction``, ``ChamferDistanceL1``, ``ChamferDistanceL2``).  The
reference hand-writes forward + scatter-add backward CUDA kernels; on TPU the
min-reduction over the pairwise distance matrix differentiates for free and
XLA fuses the whole thing.  Unused by the segmentation path but part of the
framework's op surface (reference ``install.sh:51-53``).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from .knn import square_distance


def chamfer_raw(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, N, 3), (B, M, 3) → per-point squared NN distances ((B,N), (B,M))."""
    d = square_distance(xyz1, xyz2)
    return jnp.min(d, axis=-1), jnp.min(d, axis=-2)


def chamfer_distance_l2(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                        ignore_zeros: bool = False) -> jnp.ndarray:
    """Mean of squared NN distances both ways (ChamferDistanceL2)."""
    d1, d2 = chamfer_raw(xyz1, xyz2)
    if ignore_zeros:
        m1 = jnp.any(xyz1 != 0, axis=-1)
        m2 = jnp.any(xyz2 != 0, axis=-1)
        t1 = jnp.sum(d1 * m1) / jnp.maximum(jnp.sum(m1), 1)
        t2 = jnp.sum(d2 * m2) / jnp.maximum(jnp.sum(m2), 1)
        return t1 + t2
    return jnp.mean(d1) + jnp.mean(d2)


def chamfer_distance_l1(xyz1: jnp.ndarray, xyz2: jnp.ndarray,
                        ignore_zeros: bool = False) -> jnp.ndarray:
    """Mean of unsquared NN distances both ways, halved (ChamferDistanceL1)."""
    d1, d2 = chamfer_raw(xyz1, xyz2)
    d1 = jnp.sqrt(jnp.maximum(d1, 1e-12))
    d2 = jnp.sqrt(jnp.maximum(d2, 1e-12))
    if ignore_zeros:
        m1 = jnp.any(xyz1 != 0, axis=-1)
        m2 = jnp.any(xyz2 != 0, axis=-1)
        t1 = jnp.sum(d1 * m1) / jnp.maximum(jnp.sum(m1), 1)
        t2 = jnp.sum(d2 * m2) / jnp.maximum(jnp.sum(m2), 1)
        return (t1 + t2) / 2
    return (jnp.mean(d1) + jnp.mean(d2)) / 2
