"""Approximate Earth Mover Distance.

↔ ``cpp/emd/cuda/emd_kernel.cu`` (``approxmatch`` / ``matchcost``) and the
``earth_mover_distance`` wrapper (``cpp/emd/emd.py:26-48``).  The reference's
auction-style multi-scale soft matching translates directly to dense matrix
ops: per annealing level the (N, M) kernel ``exp(level·d²)`` is an MXU matmul
away from the row/column capacity updates.  The backward pass treats the match
as constant (reference ``matchcost_backward``), which is exactly
``stop_gradient`` on the match matrix — XLA then differentiates the cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .knn import square_distance


@functools.partial(jax.jit, static_argnames=())
def approx_match(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Soft bipartite match (B, M, N) between xyz2 (M) rows and xyz1 (N) cols.

    Mirrors the annealing loop of ``approxmatch`` (emd_kernel.cu:26-158):
    levels ``-4^j`` for j = 7…-1 and finally 0.
    """
    B, N, _ = xyz1.shape
    M = xyz2.shape[1]
    d2 = square_distance(xyz1, xyz2)  # (B, N, M)
    if N >= M:
        multiL, multiR = 1.0, float(N) / M
    else:
        multiL, multiR = float(M) / N, 1.0

    remainL0 = jnp.full((B, N), multiL)
    remainR0 = jnp.full((B, M), multiR)
    match0 = jnp.zeros((B, M, N))
    levels = jnp.array([-(4.0 ** j) for j in range(7, -2, -1)] + [0.0])

    def body(carry, level):
        match, remainL, remainR = carry
        K = jnp.exp(level * d2)  # (B, N, M)
        # 1) row ratios: how much of remainL each xyz1 point offers per unit
        suml = 1e-9 + jnp.einsum("bnm,bm->bn", K, remainR)
        ratioL = remainL / suml
        # 2) column consumption
        sumr = jnp.einsum("bnm,bn->bm", K, ratioL) * remainR
        consumption = jnp.minimum(remainR / (sumr + 1e-9), 1.0)
        ratioR = consumption * remainR
        remainR = jnp.maximum(0.0, remainR - sumr)
        # 3) commit match mass and consume left capacity
        w = K * ratioL[:, :, None] * ratioR[:, None, :]  # (B, N, M)
        match = match + jnp.swapaxes(w, 1, 2)
        remainL = jnp.maximum(0.0, remainL - jnp.sum(w, axis=2))
        return (match, remainL, remainR), None

    (match, _, _), _ = lax.scan(body, (match0, remainL0, remainR0), levels)
    return match


def match_cost(xyz1: jnp.ndarray, xyz2: jnp.ndarray, match: jnp.ndarray) -> jnp.ndarray:
    """cost_b = Σ_{k,l} d²(xyz1_k, xyz2_l) · match[l, k]  (emd_kernel.cu:201-231)."""
    d2 = square_distance(xyz1, xyz2)  # (B, N, M)
    return jnp.einsum("bnm,bmn->b", d2, match)


def earth_mover_distance(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> jnp.ndarray:
    """Mean approx-EMD, normalized by N (``emd.py:32-48``)."""
    match = lax.stop_gradient(approx_match(xyz1, xyz2))
    cost = match_cost(xyz1, xyz2, match) / xyz1.shape[1]
    return jnp.mean(cost)
