"""Dilated kNN (↔ openpoints/models/layers/group.py:31-73, DenseDilated /
DilatedKNN): query k·d neighbors, keep every d-th (or a random subset of k
with probability ε during training)."""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .knn import knn


def dilated_knn(support: jnp.ndarray, query: jnp.ndarray, k: int,
                dilation: int = 1, stochastic: bool = False,
                epsilon: float = 0.0, key: Optional[jax.Array] = None,
                training: bool = False) -> jnp.ndarray:
    """Returns idx (B, M, k)."""
    idx, _ = knn(support, query, k * dilation)
    if stochastic and training and key is not None:
        def rand_pick(_):
            perm = jax.random.permutation(key, k * dilation)[:k]
            return idx[:, :, perm]

        def strided(_):
            return idx[:, :, ::dilation]

        u = jax.random.uniform(jax.random.fold_in(key, 1))
        return jax.lax.cond(u < epsilon, rand_pick, strided, None)
    return idx[:, :, ::dilation]
