"""PointNet++ encoder/decoder.

↔ ``openpoints/models/backbone/pointnetv2.py`` (PointNet2Encoder :150,
PointNet2Decoder :348).  The stage structure (FPS downsample → ball-query
grouping → per-stage MLP stack → max-pool; decoder = 3-NN FP modules) is
built from the same grouping / interpolation ops as PointNeXt; configuration
follows the reference's ``mlps``-per-stage or ``width``+strides surface.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (create_grouper, furthest_point_sample, gather_points,
                   get_aggregation_features, three_interpolation)
from .build import MODELS
from .layers import ConvBlock
from .pointnext import FeaturePropagation, to_full_list


class PointNet2SA(nn.Module):
    """One PointNet++ set-abstraction stage: FPS → group → MLPs → max-pool."""
    mlp: Sequence[int]          # per-layer output channels
    stride: int
    radius: float
    nsample: Optional[int]
    group_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    conv_args: Any = None
    feature_type: str = "dp_fj"
    sampler: str = "fps"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, training: bool = False):
        ga = dict(self.group_args or {"NAME": "ballquery"})
        ga["radius"] = self.radius
        ga["nsample"] = self.nsample
        if self.stride > 1:
            idx = furthest_point_sample(p, p.shape[1] // self.stride)
            new_p = gather_points(p, idx)
        else:
            new_p = p
        if self.nsample is None:
            ga["nsample"] = None  # GroupAll
        grouper = create_grouper(ga)
        dp, fj = grouper(new_p, p, f)
        fj = get_aggregation_features(new_p, dp, None, fj, self.feature_type)
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        for ch in self.mlp:
            fj = ConvBlock(ch, norm_args=self.norm_args or {"norm": "bn"},
                           act_args=self.act_args or {"act": "relu"},
                           order=order, bn_axis_name=self.bn_axis_name,
                           dtype=self.dtype)(fj, training=training)
        return new_p, jnp.max(fj, axis=-2)


@MODELS.register_module()
class PointNet2Encoder(nn.Module):
    """↔ PointNet2Encoder (pointnetv2.py:150-345), single-scale grouping."""
    in_channels: int = 4
    radius: Any = 0.1
    num_samples: Any = 32
    aggr_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    blocks: Any = None
    mlps: Any = None
    width: Optional[int] = None
    strides: Sequence[int] = (4, 4, 4, 4)
    layers: int = 3
    width_scaling: int = 2
    radius_scaling: float = 2
    nsample_scaling: float = 1
    sampler: str = "fps"
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def _stage_mlps(self) -> List[List[int]]:
        if self.mlps is not None:
            # reference nests per-block lists; flatten per stage
            return [[c for block in stage for c in
                     (block if isinstance(block, (list, tuple)) else [block])]
                    for stage in self.mlps]
        width = self.width or 32
        out = []
        for _ in self.strides:
            width *= self.width_scaling
            out.append([width] * self.layers)
        return out

    @property
    def channel_list(self) -> List[int]:
        return [m[-1] for m in self._stage_mlps()]

    @property
    def out_channels(self) -> int:
        return self.channel_list[-1]

    @nn.compact
    def __call__(self, p0, f0, training: bool = False):
        blocks = list(self.blocks) if self.blocks is not None \
            else [1] * len(self.strides)
        radii = to_full_list(self.radius, blocks, self.strides,
                             self.radius_scaling)
        nsamples = to_full_list(self.num_samples, blocks, self.strides,
                                self.nsample_scaling)
        aggr = dict(self.aggr_args or {"feature_type": "dp_fj"})
        mlps = self._stage_mlps()
        p_list, f_list = [p0], [f0]
        p, f = p0, f0
        for i, stage_mlp in enumerate(mlps):
            p, f = PointNet2SA(
                mlp=stage_mlp, stride=self.strides[i], radius=radii[i][0],
                nsample=nsamples[i][0], group_args=self.group_args,
                norm_args=self.norm_args, act_args=self.act_args,
                conv_args=self.conv_args,
                feature_type=aggr.get("feature_type", "dp_fj"),
                sampler=self.sampler, bn_axis_name=self.bn_axis_name,
                dtype=self.dtype, name=f"sa{i}",
            )(p, f, training=training)
            p_list.append(p)
            f_list.append(f)
        return p_list, f_list

    def forward_seg_feat(self, p0, f0, training: bool = False):
        return self(p0, f0, training=training)

    def forward_cls_feat(self, p0, f0, training: bool = False):
        _, f = self(p0, f0, training=training)
        return jnp.max(f[-1], axis=1)


@MODELS.register_module()
class PointNet2Decoder(nn.Module):
    """↔ PointNet2Decoder (pointnetv2.py:348-384): stack of FP modules."""
    encoder_channel_list: Sequence[int]
    fp_mlps: Any = None
    decoder_layers: int = 1
    in_channels_input: int = 3
    norm_args: Any = None
    act_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        if self.fp_mlps is not None:
            return list(self.fp_mlps)[0][-1]
        return list(self.encoder_channel_list)[0]

    @nn.compact
    def __call__(self, p: List, f: List, training: bool = False):
        ecl = list(self.encoder_channel_list)
        n = len(p) - 1  # FP all the way back to the input level
        # skip channels per level: input features, then encoder stages
        skip = [self.in_channels_input] + ecl[:-1]
        # fp output channels per stage: mirror the skip pyramid
        fp_out = [ecl[0]] + ecl[:-1]
        if self.fp_mlps is not None:
            fp_out = [list(m)[-1] for m in self.fp_mlps]
        f = list(f)
        in_ch = ecl[-1]
        up_features = [None] * n
        for i in range(-1, -n - 1, -1):
            mlp = [skip[i] + in_ch] + [fp_out[i]] * max(self.decoder_layers, 1)
            f[i - 1] = FeaturePropagation(
                mlp, norm_args=self.norm_args or {"norm": "bn"},
                act_args=self.act_args or {"act": "relu"},
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"fp{n + i}",
            )([p[i - 1], f[i - 1]], [p[i], f[i]], training=training)
            up_features[i] = f[i - 1]
            in_ch = mlp[-1]
        return f[-n - 1], up_features, jnp.zeros(())


@MODELS.register_module()
class PointNet2PartDecoder(nn.Module):
    """↔ PointNet2PartDecoder (pointnetv2.py:384-511): FP stack where the
    finest FP stage concatenates a 16-way one-hot shape label into the skip
    features (``skip_channel_list[0] += 16``, forward ``:497-510``)."""
    encoder_channel_list: Sequence[int]
    fp_mlps: Any = None
    decoder_layers: int = 1
    in_channels_input: int = 3
    num_classes: int = 16
    norm_args: Any = None
    act_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        if self.fp_mlps is not None:
            return list(self.fp_mlps)[0][-1]
        return list(self.encoder_channel_list)[0]

    @nn.compact
    def __call__(self, p: List, f: List, cls_label, training: bool = False):
        ecl = list(self.encoder_channel_list)
        n = len(p) - 1
        skip = [self.in_channels_input + self.num_classes] + ecl[:-1]
        fp_out = [ecl[0]] + ecl[:-1]
        if self.fp_mlps is not None:
            fp_out = [list(m)[-1] for m in self.fp_mlps]
        f = list(f)
        in_ch = ecl[-1]
        # deepest → level 1 (reference forward :498-501)
        for i in range(-1, -n, -1):
            mlp = [skip[i] + in_ch] + [fp_out[i]] * max(self.decoder_layers, 1)
            f[i - 1] = FeaturePropagation(
                mlp, norm_args=self.norm_args or {"norm": "bn"},
                act_args=self.act_args or {"act": "relu"},
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"fp{n + i}",
            )([p[i - 1], f[i - 1]], [p[i], f[i]], training=training)
            in_ch = mlp[-1]
        # level 0: one-hot class label broadcast over all N points and
        # concatenated into the skip features (reference :502-509)
        B, N = p[0].shape[0], p[0].shape[1]
        onehot = jax.nn.one_hot(jnp.reshape(cls_label, (B,)),
                                self.num_classes, dtype=jnp.float32)
        onehot = jnp.broadcast_to(onehot[:, None, :],
                                  (B, N, self.num_classes))
        skip0 = jnp.concatenate([onehot, f[0]], axis=-1) \
            if f[0] is not None else onehot
        mlp0 = [skip[0] + in_ch] + [fp_out[0]] * max(self.decoder_layers, 1)
        out = FeaturePropagation(
            mlp0, norm_args=self.norm_args or {"norm": "bn"},
            act_args=self.act_args or {"act": "relu"},
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
            name="fp0",
        )([p[0], skip0], [p[1], f[1]], training=training)
        return out
