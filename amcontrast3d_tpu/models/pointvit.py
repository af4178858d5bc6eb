"""Point cloud ViT backbone + segmentation wrapper.

↔ ``openpoints/models/backbone/pointvit.py`` (PointViT) and
``openpoints/models/segmentation/vit_seg.py:51-126`` (PointVitSeg).

Group embedding: FPS centers + kNN patches → shared MLP → max-pool tokens;
transformer encoder with pre-LN blocks, learned [cls] token and a position
MLP; segmentation propagates tokens back to points with FP modules (the
reference reuses PointNet2Decoder).  Attention is
``nn.MultiHeadDotProductAttention`` — batched MXU matmuls; DropPath is the
stochastic-depth residual gate of ``models/layers/drop.py:155``.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import furthest_point_sample, gather_points, group_points, knn
from .build import MODELS
from .pointnext import FeaturePropagation


class DropPath(nn.Module):
    """Stochastic depth (↔ models/layers/drop.py:155): drop the residual
    branch per sample."""
    rate: float = 0.0

    @nn.compact
    def __call__(self, x, training: bool = False):
        if self.rate == 0.0 or not training:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x / keep * mask


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            use_bias=self.qkv_bias, dropout_rate=self.attn_drop_rate,
            deterministic=not training, dtype=self.dtype)(h, h)
        x = x + DropPath(self.drop_path_rate)(h, training=training)
        h = nn.LayerNorm(epsilon=1e-6)(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.drop_rate, deterministic=not training)(h)
        h = nn.Dense(self.dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.drop_rate, deterministic=not training)(h)
        return x + DropPath(self.drop_path_rate)(h, training=training)


class GroupEmbed(nn.Module):
    """FPS centers + kNN patches → token embeddings (↔ layers/group_embed.py)."""
    num_groups: int = 256
    group_size: int = 32
    embed_dim: int = 256
    in_channels: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, training: bool = False):
        idx = furthest_point_sample(xyz, self.num_groups)
        centers = gather_points(xyz, idx)
        nidx, _ = knn(xyz, centers, self.group_size)
        patch_xyz = group_points(xyz, nidx) - centers[:, :, None, :]
        patch_feat = group_points(features, nidx)
        h = jnp.concatenate([patch_xyz, patch_feat], axis=-1)
        h = nn.Dense(self.embed_dim // 2, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype)(h)
        tokens = jnp.max(h, axis=-2)  # (B, G, D)
        return centers, tokens


@MODELS.register_module()
class PointViT(nn.Module):
    """↔ PointViT backbone: group embed → [cls]+pos → transformer stack."""
    in_channels: int = 6
    num_classes: int = 40
    encoder_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    embed_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    posembed_norm_args: Any = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.encoder_dim

    @nn.compact
    def __call__(self, xyz, features, training: bool = False):
        ea = dict(self.embed_args or {})
        centers, tokens = GroupEmbed(
            num_groups=int(ea.get("num_groups", 256)),
            group_size=int(ea.get("group_size", 32)),
            embed_dim=int(ea.get("embed_dim", self.encoder_dim)),
            in_channels=self.in_channels, dtype=self.dtype)(
                xyz, features, training=training)
        if tokens.shape[-1] != self.encoder_dim:
            tokens = nn.Dense(self.encoder_dim, dtype=self.dtype)(tokens)
        pos = nn.Dense(self.encoder_dim, dtype=self.dtype)(
            nn.gelu(nn.Dense(128, dtype=self.dtype)(centers)))
        cls_token = self.param("cls_token", nn.initializers.zeros,
                               (1, 1, self.encoder_dim))
        cls_pos = self.param("cls_pos", nn.initializers.zeros,
                             (1, 1, self.encoder_dim))
        B = tokens.shape[0]
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.encoder_dim)), tokens], 1)
        p = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.encoder_dim)), pos], 1)
        x = x + p
        dp_rates = [float(r) for r in
                    jnp.linspace(0, self.drop_path_rate, self.depth)]
        for i in range(self.depth):
            x = TransformerBlock(self.encoder_dim, self.num_heads,
                                 self.mlp_ratio, self.qkv_bias,
                                 self.drop_rate, self.attn_drop_rate,
                                 dp_rates[i], dtype=self.dtype,
                                 name=f"block{i}")(x, training=training)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        return centers, x  # tokens include [cls] at position 0


@MODELS.register_module()
class PointVitSeg(nn.Module):
    """↔ PointVitSeg (vit_seg.py:51-126): ViT tokens propagated back to the
    full cloud through FP modules, PointNet-style scene seg head."""
    in_channels: int = 6
    num_classes: int = 13
    encoder_dim: int = 384
    depth: int = 6
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    embed_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    num_points: Sequence[int] = (2048, 512)
    fp_mlps: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xyz, features, training: bool = False):
        encoder = PointViT(
            in_channels=self.in_channels, num_classes=self.num_classes,
            encoder_dim=self.encoder_dim, depth=self.depth,
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias, drop_rate=self.drop_rate,
            attn_drop_rate=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            embed_args=self.embed_args, dtype=self.dtype, name="encoder")
        centers, tokens = encoder(xyz, features, training=training)
        l_feature = tokens[:, 1:, :]  # drop [cls]

        # multi-resolution skip pyramid over raw features (vit_seg.py:105-113)
        l_xyz, l_features = [xyz], [features]
        for npoints in list(self.num_points)[:-1]:
            idx = furthest_point_sample(xyz, int(npoints))
            l_xyz.append(gather_points(xyz, idx))
            l_features.append(gather_points(features, idx))
        l_xyz.append(centers)
        l_features.append(l_feature)

        n = len(l_xyz) - 1
        fp_mlps = self.fp_mlps or [[128, 128]] * n
        f = list(l_features)
        in_ch = self.encoder_dim
        for i in range(-1, -n - 1, -1):
            skip_ch = f[i - 1].shape[-1]
            mlp = [skip_ch + in_ch] + list(fp_mlps[i])
            f[i - 1] = FeaturePropagation(
                mlp, norm_args={"norm": "bn"}, act_args={"act": "relu"},
                dtype=self.dtype, name=f"fp{n + i}",
            )([l_xyz[i - 1], f[i - 1]], [l_xyz[i], f[i]], training=training)
            in_ch = mlp[-1]
        h = f[0]
        h = nn.Dense(128, dtype=self.dtype)(h)
        h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return nn.Dense(self.num_classes, dtype=self.dtype)(h)
