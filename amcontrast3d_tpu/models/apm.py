"""Ambiguity Prediction Module (APM) — predicts per-point ambiguity a∈(0,1).

↔ ``openpoints/AMContrast3D/APM/concatenation.py`` (default ``APM_pf_ConCate``)
and ``APM/separation.py`` (position-only ablations).  The reference builds one
Linear/BN/Sigmoid tower per encoder stage and dispatches on the feature
dimension at forward time (concatenation.py:169-197); here the stage index is
explicit.  BatchNorm1d over the flattened (B·N, C) tensor is equivalent to
BatchNorm over (B, N, C) reducing all but the channel axis.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .build import MODELS
from ..ops import knn, group_points


class _SigmoidTower(nn.Module):
    """Linear→Dropout→BN→Sigmoid stack ending in a 1-channel sigmoid head
    (concatenation.py:29-58)."""
    channels: Sequence[int]
    dropout: Sequence[float]
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        for i, ch in enumerate(self.channels):
            x = nn.Dense(ch, dtype=self.dtype)(x)
            rate = self.dropout[i] if i < len(self.dropout) else 0.0
            if rate:
                x = nn.Dropout(rate, deterministic=not training)(x)
            x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, axis_name=self.bn_axis_name,
                             dtype=jnp.float32)(x)
            x = nn.sigmoid(x)
        x = nn.Dense(1, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, axis_name=self.bn_axis_name,
                         dtype=jnp.float32)(x)
        return nn.sigmoid(x)


@MODELS.register_module()
class APM_pf_ConCate(nn.Module):
    """Concat(p, f) → a (default APM; concatenation.py:9-197)."""
    feature_dim: Sequence[int] = (64, 128, 256, 512)
    linear_mapping: bool = True
    cross_attention: bool = False
    feat_concate: bool = True
    channel: Sequence[int] = (32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0, 0, 0, 0, 0)
    nsample_k: int = 12
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    att_dim: int = 3
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, stage: int, training: bool = False):
        """p: (B, N, 3), f: (B, N, D_stage) → a: (B, N, 1) (+ a_map (B, N, D))."""
        assert f.shape[-1] == self.feature_dim[stage], (
            f"stage {stage} feature dim {f.shape[-1]} != {self.feature_dim[stage]}")
        x = jnp.concatenate([p, f], axis=-1)
        a = _SigmoidTower(self.channel, self.dropout,
                          bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"layer_{stage}")(x, training=training)
        if self.linear_mapping:
            a_map = nn.Dense(self.feature_dim[stage], dtype=self.dtype,
                             name=f"map_{stage}")(a)
            a_map = nn.sigmoid(a_map)
            return a, a_map
        return a


@MODELS.register_module()
class APM_p(nn.Module):
    """Position-only MLP ablation (separation.py:12-61)."""
    channel: Sequence[int] = (32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0, 0, 0, 0, 0)
    linear_mapping: bool = False
    cross_attention: bool = False
    feat_concate: bool = False
    nsample_k: int = 12
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f=None, stage: int = 0, training: bool = False):
        return _SigmoidTower(self.channel, self.dropout,
                             bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype)(p, training=training)


@MODELS.register_module()
class APM_p_Group(nn.Module):
    """kNN relative-position grouped ablation (separation.py:74-129):
    per-point kNN(k) relative coordinates → shared MLP → max-pool → tower."""
    k: int = 12
    channel: Sequence[int] = (32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0, 0, 0, 0, 0)
    linear_mapping: bool = False
    cross_attention: bool = False
    feat_concate: bool = False
    nsample_k: int = 12
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f=None, stage: int = 0, training: bool = False):
        idx, _ = knn(p, p, self.k)
        rel = group_points(p, idx) - p[:, :, None, :]  # (B, N, k, 3)
        h = nn.Dense(self.channel[0], dtype=self.dtype)(rel)
        h = nn.relu(h)
        h = jnp.max(h, axis=-2)  # (B, N, c0)
        return _SigmoidTower(self.channel[1:], self.dropout[1:],
                             bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype)(h, training=training)


class Attention(nn.Module):
    """QKV cross-attention block (APM/attention.py:10-34): x provides Q,
    y provides K and V."""
    dim_q: int
    dim_kv: int
    dim_out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        q = nn.Dense(self.dim_out, dtype=self.dtype)(x)     # (B, N, D)
        k = nn.Dense(self.dim_out, dtype=self.dtype)(y)
        v = nn.Dense(self.dim_out, dtype=self.dtype)(y)
        attn = jnp.einsum("bnd,bmd->bnm", q, k) / jnp.sqrt(float(self.dim_out))
        attn = nn.softmax(attn, axis=-1)
        return jnp.einsum("bnm,bmd->bnd", attn, v)


@MODELS.register_module()
class APM_pf_CrossAtt(nn.Module):
    """Cross-attend lifted positions against features, then tower
    (APM/attention.py:37-131)."""
    feature_dim: Sequence[int] = (64, 128, 256, 512)
    channel: Sequence[int] = (32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0, 0, 0, 0, 0)
    linear_mapping: bool = False
    cross_attention: bool = True
    feat_concate: bool = False
    nsample_k: int = 12
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    att_dim: int = 3
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, stage: int, training: bool = False):
        d = self.feature_dim[stage]
        p_ext = nn.Dense(d, dtype=self.dtype, name=f"ext_{stage}")(p)
        h = Attention(d, d, d, dtype=self.dtype, name=f"att_{stage}")(p_ext, f)
        a = _SigmoidTower(self.channel, self.dropout,
                          bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"layer_{stage}")(h, training=training)
        if self.linear_mapping:
            a_map = nn.sigmoid(nn.Dense(d, dtype=self.dtype, name=f"map_{stage}")(a))
            return a, a_map
        return a


@MODELS.register_module()
class APM_p_Graph(nn.Module):
    """Star-graph GCN ablation (separation.py:167-238, path '2').

    Upstream this is experimental dead code (depends on torch-geometric's
    ``GCNConv``, loops over points in Python, and is never referenced by any
    config); the math it implements has a closed form on the star graph that
    is reproduced here exactly:

    per point i, nodes are x₀ = pᵢ and x_j = |pᵢ − p_{n_j}| over the k−1
    nearest neighbors; edges 0→j plus self-loops give GCN degrees
    deg₀ = 1, deg_j = 2, so one GCNConv(3→1) followed by the reference's
    average pool over nodes reduces to

      out_i = W·[ x₀·(1 + (k−1)/√2) + ½·Σ_j x_j ] / k + b.
    """
    nsample_k: int = 12
    linear_mapping: bool = True
    cross_attention: bool = False
    feat_concate: bool = True
    feature_dim: Sequence[int] = (64, 128, 256, 512)
    channel: Sequence[int] = (64, 32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0.2, 0, 0, 0, 0, 0)
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    att_dim: int = 3
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f=None, stage: int = 0, training: bool = False):
        k = self.nsample_k
        idx, _ = knn(p, p, k)
        rel = jnp.abs(group_points(p, idx[..., 1:]) - p[:, :, None, :])
        agg = (p * (1.0 + (k - 1) / jnp.sqrt(2.0)) +
               0.5 * jnp.sum(rel, axis=-2)) / float(k)       # (B, N, 3)
        return nn.Dense(1, dtype=self.dtype, name="gcnconv")(agg)


@MODELS.register_module()
class APM_pp_SelfAtt(nn.Module):
    """Self-attention over lifted positions (APM/attention.py:134-168)."""
    att_dim: int = 16
    channel: Sequence[int] = (32, 16, 8, 4, 2)
    dropout: Sequence[float] = (0, 0, 0, 0, 0)
    linear_mapping: bool = False
    cross_attention: bool = False
    feat_concate: bool = False
    nsample_k: int = 12
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    fusion: str = "MIN"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f=None, stage: int = 0, training: bool = False):
        h = Attention(3, 3, self.att_dim, dtype=self.dtype)(p, p)
        return _SigmoidTower(self.channel, self.dropout,
                             bn_axis_name=self.bn_axis_name,
                             dtype=self.dtype)(h, training=training)
