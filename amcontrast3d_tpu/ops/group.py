"""Gather / group ops and the grouper front-ends.

Replaces the reference autograd Functions with plain XLA gathers — autodiff
gives the scatter-add backward that the CUDA kernels implement by hand
(``cpp/pointnet2_batch/src/group_points_gpu.cu``; wrappers
``models/layers/group.py:76-174``).

Layout: channels-LAST everywhere — features are (B, N, C) and grouped
neighborhoods are (B, M, K, C) with C on the TPU lane dimension, so the
1×1-conv MLPs that follow are plain (…, C_in) @ (C_in, C_out) matmuls on the
MXU (the reference uses (B, C, N)/(B, C, M, K) torch conv layout instead).
"""
from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .knn import ball_query, knn


def gather_points(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, C), idx: (B, M) → (B, M, C)  (↔ gather_operation, group.py:140-174)."""
    return jnp.take_along_axis(x, idx[..., None].astype(jnp.int32), axis=1)


def group_points(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """x: (B, N, C), idx: (B, M, K) → (B, M, K, C)  (↔ grouping_operation, group.py:76-117)."""
    if os.environ.get("AMC3D_GROUP_BWD", "scatter") == "sorted":
        return _group_points_sortedbwd(x, idx)
    B, M, K = idx.shape
    flat = jnp.take_along_axis(x, idx.reshape(B, M * K, 1).astype(jnp.int32), axis=1)
    return flat.reshape(B, M, K, x.shape[-1])


@jax.custom_vjp
def _group_points_sortedbwd(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """group_points whose transpose scatter-adds in support-id-sorted order
    (`indices_are_sorted`), an alternative codegen for the incidence
    transpose that dominates the aggregation-tail backward.  Same math as
    the autodiff scatter up to fp add associativity.  Consecutive blocks of
    an encoder stage share `idx`, so XLA CSEs the per-stage argsort.
    Env-gated: ``AMC3D_GROUP_BWD=sorted`` (default keeps XLA's scatter)."""
    B, M, K = idx.shape
    flat = jnp.take_along_axis(x, idx.reshape(B, M * K, 1).astype(jnp.int32), axis=1)
    return flat.reshape(B, M, K, x.shape[-1])


def _gp_sorted_fwd(x, idx):
    return _group_points_sortedbwd(x, idx), (idx, x.shape[1])


def _gp_sorted_bwd(res, ct):
    idx, n = res
    B, M, K = idx.shape
    C = ct.shape[-1]
    ids = idx.reshape(B, M * K).astype(jnp.int32)
    order = jnp.argsort(ids, axis=1)
    sids = jnp.take_along_axis(ids, order, axis=1)
    sct = jnp.take_along_axis(ct.reshape(B, M * K, C), order[..., None], axis=1)
    bi = jnp.arange(B)[:, None]
    dx = jnp.zeros((B, n, C), ct.dtype).at[bi, sids].add(
        sct, indices_are_sorted=True)
    return dx, np.zeros(idx.shape, jax.dtypes.float0)


_group_points_sortedbwd.defvjp(_gp_sorted_fwd, _gp_sorted_bwd)


class Grouper(NamedTuple):
    """A configured neighborhood grouper (↔ ``create_grouper``, group.py:338-352).

    method: 'ballquery' | 'knn' | 'all'
    """
    method: str
    radius: Optional[float]
    nsample: Optional[int]
    relative_xyz: bool = True
    normalize_dp: bool = False

    def __call__(self, query_xyz: jnp.ndarray, support_xyz: jnp.ndarray,
                 features: Optional[jnp.ndarray] = None,
                 n_valid: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """Returns (dp (B, M, K, 3), fj (B, M, K, C) or None).

        n_valid (B,): on the masked variable path, per-cloud valid-prefix
        counts of the support set — members pointing at padded rows are
        replaced by each query's first member (↔ knnquery's repeat-first
        padding), so far-pushed padding never enters the conv stack."""
        if self.method == "all":
            # GroupAll (group.py:258-272): one group holding every point,
            # absolute coordinates (no query subtraction).
            dp = support_xyz[:, None]  # (B, 1, N, 3)
            fj = features[:, None] if features is not None else None
            return dp, fj
        if self.method == "ballquery":
            idx = ball_query(support_xyz, query_xyz, self.radius, self.nsample)
        elif self.method == "knn":
            idx, _ = knn(support_xyz, query_xyz, self.nsample)
        else:
            raise ValueError(f"unknown grouper {self.method}")
        idx = clamp_members_valid(idx, n_valid)
        grouped_xyz = group_points(support_xyz, idx)
        if self.relative_xyz:
            grouped_xyz = grouped_xyz - query_xyz[:, :, None, :]
            if self.normalize_dp and self.method == "ballquery":
                # QueryAndGroup normalizes by the ball radius (group.py:252-253)
                grouped_xyz = grouped_xyz / self.radius
        fj = group_points(features, idx) if features is not None else None
        return grouped_xyz, fj


def clamp_members_valid(idx: jnp.ndarray,
                        n_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Replace neighbor members that index padded support rows (idx ≥
    n_valid; valid rows are a prefix) with the query's first member — the
    reference's knnquery pads short neighborhoods with real in-segment
    points the same way.  No-op when n_valid is None."""
    if n_valid is None:
        return idx
    valid = idx < n_valid[:, None, None]
    return jnp.where(valid, idx, idx[:, :, :1])


def create_grouper(group_args) -> Grouper:
    ga = dict(group_args) if group_args is not None else {}
    method = ga.get("NAME", "ballquery")
    radius = ga.get("radius", 0.1)
    nsample = ga.get("nsample", 20)
    if nsample is None:
        method = "all"
    return Grouper(method=method, radius=radius, nsample=nsample,
                   relative_xyz=ga.get("relative_xyz", True),
                   normalize_dp=ga.get("normalize_dp", False))


def get_aggregation_features(p: jnp.ndarray, dp: jnp.ndarray,
                             f: Optional[jnp.ndarray], fj: jnp.ndarray,
                             feature_type: str = "dp_fj") -> jnp.ndarray:
    """Channels-last port of ``get_aggregation_feautres`` (group.py:323-335).

    p: (B, M, 3) query positions, dp: (B, M, K, 3), f: (B, M, C) center
    features (only needed for *_df types), fj: (B, M, K, C).
    """
    if feature_type == "dp_fj":
        return jnp.concatenate([dp, fj], axis=-1)
    if feature_type == "dp_fj_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, fj, df], axis=-1)
    if feature_type == "pi_dp_fj_df":
        df = fj - f[:, :, None, :]
        pi = jnp.broadcast_to(p[:, :, None, :], dp.shape)
        return jnp.concatenate([pi, dp, fj, df], axis=-1)
    if feature_type == "dp_df":
        df = fj - f[:, :, None, :]
        return jnp.concatenate([dp, df], axis=-1)
    raise ValueError(f"unknown feature_type {feature_type}")


# feature_type → input channel count (↔ local_aggregation.py:13-29)
CHANNEL_MAP = {
    "fj": lambda x: x,
    "df": lambda x: x,
    "assa": lambda x: x * 3,
    "assa_dp": lambda x: x * 3 + 3,
    "dp_fj": lambda x: 3 + x,
    "pj": lambda x: x,
    "dp": lambda x: 3,
    "pi_dp": lambda x: x + 3,
    "pj_dp": lambda x: x + 3,
    "dp_fj_df": lambda x: x * 2 + 3,
    "dp_fi_df": lambda x: x * 2 + 3,
    "pi_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_fj_df": lambda x: x * 2 + 6,
    "pj_dp_df": lambda x: x + 6,
    "dp_df": lambda x: x + 3,
}
