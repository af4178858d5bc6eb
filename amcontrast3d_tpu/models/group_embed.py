"""Point-cloud patch embeddings (token-izers for ViT-style backbones).

↔ ``openpoints/models/layers/group_embed.py`` — ``SubsampleGroup`` (:14-56),
``PointPatchEmbed`` (:59-180), ``P3Embed`` (:183-286).  Channels-last Flax
redesign: the torch (B, C, M, K) conv2d stacks become Dense blocks on
(B, M, K, C) tensors (pointwise convs are matmuls either way — this keeps
the channel dim in lanes for the MXU), and the subsample/group primitives
are the shared TPU ops (FPS kernel, ball query / kNN groupers).
"""
from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (CHANNEL_MAP, create_grouper, furthest_point_sample,
                   gather_points, get_aggregation_features)
from .build import MODELS
from .layers import ConvBlock


def _sample_idx(module: nn.Module, subsample: str, p, npoint: int):
    """FPS or random subsample indices (↔ group_embed.py:40-45, 98-101).

    Random sampling draws from the ``sample`` rng stream when one is bound
    (training); otherwise it falls back to a deterministic strided pick so
    eval/init stay reproducible (reference uses torch.randint either way).
    """
    s = subsample.lower()
    if "fps" in s or "furthest" in s or "farthest" in s:
        return furthest_point_sample(p, npoint)
    if "random" in s or "rs" in s:
        B, N = p.shape[0], p.shape[1]
        if module.has_rng("sample"):
            key = module.make_rng("sample")
            return jax.random.randint(key, (B, npoint), 0, N, dtype=jnp.int32)
        stride = max(N // npoint, 1)
        idx = (jnp.arange(npoint, dtype=jnp.int32) * stride) % N
        return jnp.broadcast_to(idx[None], (B, npoint))
    raise NotImplementedError(
        f"{subsample} is not implemented. Only support fps, random")


def _make_grouper(group: str, group_size: int, radius: float,
                  relative_xyz: bool = True, normalize_dp: bool = False):
    g = group.lower()
    if "ball" in g or "query" in g:
        name = "ballquery"
    elif "knn" in g:
        name = "knn"
    else:
        raise NotImplementedError(
            f"{g} is not implemented. Only support ballquery, knn")
    return create_grouper({"NAME": name, "radius": radius,
                           "nsample": group_size,
                           "relative_xyz": relative_xyz,
                           "normalize_dp": normalize_dp})


class SubsampleGroup(nn.Module):
    """Point cloud → subsampled neighborhoods (↔ group_embed.py:14-56)."""
    num_groups: int = 256
    group_size: int = 32
    subsample: str = "fps"
    group: str = "ballquery"
    radius: float = 0.1

    @nn.compact
    def __call__(self, p, x=None):
        idx = _sample_idx(self, self.subsample, p, self.num_groups)
        center_p = gather_points(p, idx)
        grouper = _make_grouper(self.group, self.group_size, self.radius)
        if x is not None:
            center_x = gather_points(x, idx)
            grouped_p, fj = grouper(center_p, p, x)
            return grouped_p, center_p, fj, center_x
        grouped_p, _ = grouper(center_p, p, None)
        return grouped_p, center_p


@MODELS.register_module()
class PointPatchEmbed(nn.Module):
    """Single-shot patch embedding (↔ group_embed.py:59-180).

    FPS (ratio) → group → feature_type dispatch → conv1 stack →
    [maxpool ‖ per-neighbor] concat → conv2 stack → pool; returns
    ``([p, center_p], [x, out_f])`` exactly like the reference forward.
    """
    sample_ratio: float = 0.0625
    group_size: int = 32
    in_channels: int = 3
    layers: int = 4
    embed_dim: int = 256
    channels: Any = None
    subsample: str = "fps"
    group: str = "ballquery"
    normalize_dp: bool = False
    radius: float = 0.1
    feature_type: str = "dp_df"
    relative_xyz: bool = True
    norm_args: Any = None
    act_args: Any = None
    conv_args: Any = None
    reduction: str = "max"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        if self.channels is not None:
            return self.embed_dim
        return self.embed_dim

    @property
    def channel_list(self):
        return [self.in_channels, self.embed_dim]

    def _pool(self, x):
        if self.reduction in ("mean", "avg", "meanpool", "avgpool"):
            return jnp.mean(x, axis=-2)
        return jnp.max(x, axis=-2)

    @nn.compact
    def __call__(self, p, x=None, training: bool = False):
        layers = self.layers
        if self.channels is None:
            channels = ([CHANNEL_MAP[self.feature_type](self.in_channels)]
                        + [self.embed_dim] * (layers // 2)
                        + [self.embed_dim * 2] * (layers // 2 - 1)
                        + [self.embed_dim])
        else:
            channels = ([CHANNEL_MAP[self.feature_type](self.in_channels)]
                        + list(self.channels) + [self.embed_dim])
            layers = len(channels) - 1

        N = p.shape[1]
        idx = _sample_idx(self, self.subsample, p,
                          int(N * self.sample_ratio))
        center_p = gather_points(p, idx)
        grouper = _make_grouper(self.group, self.group_size, self.radius,
                                self.relative_xyz, self.normalize_dp)
        dp, fj = grouper(center_p, p, x)

        # feature_type dispatch (reference forward :156-168)
        ft = self.feature_type
        if ft == "dp":
            fj = dp
        elif ft == "dp_fj":
            fj = jnp.concatenate([dp, fj], axis=-1)
        elif ft == "dp_df":
            center_x = gather_points(x, idx)
            fj = jnp.concatenate([dp, fj - center_x[:, :, None, :]], axis=-1)
        elif ft == "df":
            center_x = gather_points(x, idx)
            fj = fj - center_x[:, :, None, :]
        else:
            raise ValueError(f"feature_type {ft} unsupported here")

        order = (self.conv_args or {}).get("order", "conv-norm-act")
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        # conv1: last block has neither norm nor act (reference :115-120)
        for i in range(layers // 2):
            last = i == (layers // 2 - 1)
            fj = ConvBlock(channels[i + 1],
                           norm_args=None if last else norm_args,
                           act_args=None if last else act_args,
                           order=order, bn_axis_name=self.bn_axis_name,
                           dtype=self.dtype, name=f"conv1_{i}")(
                               fj, training=training)
        # global-context concat doubles the mid channel (reference :122,170-173)
        pooled = self._pool(fj)
        fj = jnp.concatenate(
            [jnp.broadcast_to(pooled[:, :, None, :], fj.shape), fj], axis=-1)
        for i in range(layers // 2, layers):
            last = i == (layers - 1)
            fj = ConvBlock(channels[i + 1],
                           norm_args=None if last else norm_args,
                           act_args=None if last else act_args,
                           order=order, bn_axis_name=self.bn_axis_name,
                           dtype=self.dtype, name=f"conv2_{i}")(
                               fj, training=training)
        out_f = self._pool(fj)
        return [p, center_p], [x, out_f]


@MODELS.register_module()
class P3Embed(nn.Module):
    """Progressive patch embedding (↔ group_embed.py:183-286): repeats the
    sample→group→conv→pool stage ``log_scale(1/ratio)`` times, doubling the
    embedding width each stage; returns the full (out_p, out_f) pyramids."""
    sample_ratio: float = 0.0625
    scale: int = 4
    group_size: int = 32
    in_channels: int = 3
    layers: int = 4
    embed_dim: int = 256
    subsample: str = "fps"
    group: str = "ballquery"
    normalize_dp: bool = False
    radius: float = 0.1
    feature_type: str = "dp_df"
    relative_xyz: bool = True
    norm_args: Any = None
    act_args: Any = None
    conv_args: Any = None
    reduction: str = "max"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def stages(self) -> int:
        return int(math.log(1 / self.sample_ratio, self.scale))

    @property
    def out_channels(self) -> int:
        return int(self.embed_dim // 2 ** (self.stages - 1)) \
            * 2 ** (self.stages - 1)

    @property
    def channel_list(self):
        dim = int(self.embed_dim // 2 ** (self.stages - 1))
        out = [self.in_channels]
        for _ in range(self.stages):
            out.append(dim)
            dim *= 2
        return out

    def _pool(self, x):
        if self.reduction in ("mean", "avg", "meanpool", "avgpool"):
            return jnp.mean(x, axis=-2)
        return jnp.max(x, axis=-2)

    @nn.compact
    def __call__(self, p, f=None, training: bool = False):
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        layers = self.layers
        in_ch = self.in_channels
        embed_dim = int(self.embed_dim // 2 ** (self.stages - 1))
        N = p.shape[1]
        out_p, out_f = [p], [f]
        for s in range(self.stages):
            cur_p, cur_f = out_p[-1], out_f[-1]
            # reference hardcodes //4 per stage in forward (:265)
            N = N // 4
            idx = _sample_idx(self, self.subsample, cur_p, N)
            center_p = gather_points(cur_p, idx)
            center_f = gather_points(cur_f, idx)
            grouper = _make_grouper(self.group, self.group_size, self.radius,
                                    self.relative_xyz, self.normalize_dp)
            dp, fj = grouper(center_p, cur_p, cur_f)
            fj = get_aggregation_features(center_p, dp, center_f, fj,
                                          self.feature_type)
            channels = ([CHANNEL_MAP[self.feature_type](in_ch)]
                        + [embed_dim] * (layers // 2)
                        + [embed_dim * 2] * (layers // 2 - 1) + [embed_dim])
            for i in range(layers // 2):
                last = i == (layers // 2 - 1)
                fj = ConvBlock(channels[i + 1],
                               norm_args=None if last else norm_args,
                               act_args=None if last else act_args,
                               order=order, bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype, name=f"s{s}_conv1_{i}")(
                                   fj, training=training)
            pooled = self._pool(fj)
            fj = jnp.concatenate(
                [jnp.broadcast_to(pooled[:, :, None, :], fj.shape), fj],
                axis=-1)
            # conv2 keeps norm+act on every block (reference :246-252)
            for i in range(layers // 2, layers):
                fj = ConvBlock(channels[i + 1],
                               norm_args=norm_args, act_args=act_args,
                               order=order, bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype, name=f"s{s}_conv2_{i}")(
                                   fj, training=training)
            out_f.append(self._pool(fj))
            out_p.append(center_p)
            in_ch = embed_dim
            embed_dim *= 2
        return out_p, out_f
