"""Alternative local-aggregation operators (ASSANet family).

↔ ``openpoints/models/layers/local_aggregation.py`` (ASSA :32, ConvPool :141;
the dispatching ``LocalAggregation`` :246 corresponds to
``models.pointnext.LocalAggregation`` for the ConvPool path).

ASSA = Anisotropic Separable Set Abstraction: pre-convs on support features,
then the neighborhood features are modulated by the 3 relative-coordinate
channels (an outer product fj ⊗ dp that triples the channel count), reduced,
and post-convolved — all channels-last so every conv is an MXU Dense.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops import create_grouper, gather_points, get_aggregation_features
from .layers import ConvBlock, create_act


def _reduce(reduction: str):
    reduction = "mean" if reduction.lower() == "avg" else reduction.lower()
    return {"max": lambda x: jnp.max(x, axis=-2),
            "mean": lambda x: jnp.mean(x, axis=-2),
            "sum": lambda x: jnp.sum(x, axis=-2)}[reduction]


class ASSA(nn.Module):
    """↔ ASSA (local_aggregation.py:32-138)."""
    channels: Sequence[int]
    conv_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    group_args: Any = None
    feature_type: str = "assa"
    reduction: str = "mean"
    use_res: bool = True
    num_preconv: int = 1
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_xyz, support_xyz, features, query_idx=None,
                 training: bool = False):
        chans = list(self.channels)
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        # pre-convs on support features (local_aggregation.py:118)
        for ch in chans[1:1 + self.num_preconv]:
            features = ConvBlock(ch, norm_args=self.norm_args,
                                 act_args=self.act_args, order=order,
                                 bn_axis_name=self.bn_axis_name,
                                 dtype=self.dtype)(features, training=training)
        grouper = create_grouper(self.group_args)
        dp, fj = grouper(query_xyz, support_xyz, features)
        if self.use_res and query_idx is not None:
            identity = gather_points(features, query_idx)
        else:
            identity = features if self.use_res else None
        # anisotropic modulation: fj (B,M,K,C) ⊗ dp (B,M,K,3) → (B,M,K,3C)
        B, M, K, C = fj.shape
        fj = (fj[..., None, :] * dp[..., :, None]).reshape(B, M, K, 3 * C)
        out = _reduce(self.reduction)(fj)
        for ch in chans[1 + self.num_preconv:]:
            out = ConvBlock(ch, norm_args=self.norm_args,
                            act_args=self.act_args, order=order,
                            bn_axis_name=self.bn_axis_name,
                            dtype=self.dtype)(out, training=training)
        if identity is not None:
            if identity.shape[-1] != out.shape[-1]:
                identity = ConvBlock(out.shape[-1], norm_args=None,
                                     act_args=None,
                                     dtype=self.dtype)(identity,
                                                       training=training)
            act = create_act(self.act_args or {"act": "relu"})
            out = act(out + identity)
        return out


class ConvPool(nn.Module):
    """↔ ConvPool (local_aggregation.py:141-243): shared convs on the
    aggregated neighborhood then pool."""
    channels: Sequence[int]
    conv_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    group_args: Any = None
    feature_type: str = "dp_fj"
    reduction: str = "max"
    use_res: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, query_xyz, support_xyz, features, query_idx=None,
                 training: bool = False):
        grouper = create_grouper(self.group_args)
        dp, fj = grouper(query_xyz, support_xyz, features)
        f_center = (gather_points(features, query_idx)
                    if query_idx is not None else features)
        fj = get_aggregation_features(query_xyz, dp, f_center, fj,
                                      self.feature_type)
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        for ch in list(self.channels)[1:]:
            fj = ConvBlock(ch, norm_args=self.norm_args,
                           act_args=self.act_args, order=order,
                           bn_axis_name=self.bn_axis_name,
                           dtype=self.dtype)(fj, training=training)
        out = _reduce(self.reduction)(fj)
        if self.use_res and query_idx is not None:
            identity = gather_points(features, query_idx)
            if identity.shape[-1] == out.shape[-1]:
                act = create_act(self.act_args or {"act": "relu"})
                out = act(out + identity)
        return out
