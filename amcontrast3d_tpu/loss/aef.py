"""AEF label propagation and per-stage ambiguity (functional, fixed-shape).

↔ ``openpoints/AMContrast3D/AEF/utils.py:11-52`` (``get_subscene_label_CBL``,
borrowed from CBL) and the AEF invocation pattern of
``MarginContrast.py:220-259``.

Stage features here are dense (B, N_s, C); the reference flattens the batch
and runs one offset-kNN over all clouds at once (cross-cloud neighborhoods,
``pointnext_AA.py:459-462``) — we keep clouds separate (documented deviation,
see ops/knn.py).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import ambiguity_function, group_points, knn

NSTRIDE = (4, 4, 4, 4)  # MarginContrast.py:59


def one_hot_labels(target: jnp.ndarray, num_classes: int,
                   ignore_index: Optional[int] = None) -> jnp.ndarray:
    """target: (B, N0) int → (B, N0, ncls[+1]) float one-hot.

    With ``ignore_index`` an extra virtual class absorbs ignored points
    (AEF/utils.py:15-20).
    """
    if ignore_index is not None:
        num_classes = num_classes + 1
        target = jnp.where(target == ignore_index, num_classes - 1, target)
    return jax.nn.one_hot(target, num_classes, dtype=jnp.float32)


def gather_int(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N) int, idx: (B, M, K) → (B, M, K) (13× less HBM traffic than
    gathering one-hot label vectors — profiling showed the one-hot gathers
    dominate the loss)."""
    B, M, K = idx.shape
    flat = jnp.take_along_axis(x, idx.reshape(B, M * K), axis=1)
    return flat.reshape(B, M, K)


def subscene_labels(labels0: jnp.ndarray, p0: jnp.ndarray,
                    p_stage: jnp.ndarray, stage_i: int) -> jnp.ndarray:
    """Soft labels for a subsampled stage: mean one-hot over the
    kr = prod(nstride[:i]) nearest stage-0 points (AEF/utils.py:22-43).

    labels0: (B, N0, ncls) one-hot at full resolution; p0: (B, N0, 3);
    p_stage: (B, N_s, 3).  stage_i == 0 returns labels0 unchanged.

    Equivalent optimization: gather the int class ids (1 value/point) and
    one-hot on the fly instead of gathering ncls-wide one-hot rows —
    identical mean because labels0 is hard one-hot.
    """
    if stage_i == 0:
        return labels0
    kr = 1
    for s in NSTRIDE[:stage_i]:
        kr *= s
    ncls = labels0.shape[-1]
    idx, _ = knn(p0, p_stage, kr)
    ints0 = jnp.argmax(labels0, axis=-1)           # (B, N0)
    neigh = gather_int(ints0, idx)                 # (B, N_s, kr)
    return jnp.mean(jax.nn.one_hot(neigh, ncls, dtype=jnp.float32), axis=-2)


def stage_neighborhood(p: jnp.ndarray, labels: jnp.ndarray, nsample: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN(nsample) with self-loop dropped → (idx (B,N,K), posmask (B,N,K),
    dd (B,N,K) squared neighbor distances).  K = nsample − 1.

    posmask follows ``posmask_cnt`` (MarginContrast.py:111-115): argmax of
    the (possibly soft) one-hot labels — argmax-then-gather ≡
    gather-then-argmax, at 1/ncls the gather traffic.  The neighbor d² reuse
    the kNN's own distances (the reference recomputes square_distance over
    re-gathered positions, AEF/ambiguity.py:28-52 — same values).
    """
    idx, d2 = knn(p, p, nsample)
    idx = idx[..., 1:]  # exclude self-loop (MarginContrast.py:225-226)
    dd = d2[..., 1:]
    lab = jnp.argmax(labels, axis=-1)                      # (B, N)
    neigh_lab = gather_int(lab, idx)                       # (B, N, K)
    posmask = lab[..., None] == neigh_lab
    return idx, posmask, dd


def stage_ambiguity(p: jnp.ndarray, labels: jnp.ndarray, nsample: int,
                    cctype: str, ccbeta: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Ground-truth ambiguity for one stage (↔ AmbiguityHead.point_ambiguity,
    MarginContrast.py:29-42).  Returns (a (B,N), posmask, idx)."""
    idx, posmask, dd = stage_neighborhood(p, labels, nsample)
    a = ambiguity_function(posmask, dd, cctype, ccbeta)
    return jax.lax.stop_gradient(a), posmask, idx
