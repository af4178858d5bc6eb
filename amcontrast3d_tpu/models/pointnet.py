"""PointNet encoder with input/feature spatial transformers.

↔ ``openpoints/models/backbone/pointnet.py`` (STN3d :12, STNkd :50,
PointNetEncoder :90).  Channels-last: the torch (B, C, N) conv1d stacks are
Dense layers over (B, N, C); the learned k×k transforms are batched matmuls
on the MXU.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .build import MODELS


def _bn(training):
    return nn.BatchNorm(use_running_average=not training, momentum=0.9,
                        epsilon=1e-5)


class STN(nn.Module):
    """Spatial transformer predicting a k×k alignment matrix
    (↔ STN3d/STNkd, pointnet.py:12-86).  The final layer is zero-initialized
    with an identity bias so the transform starts as I."""
    k: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        h = x
        for ch in (64, 128, 1024):
            h = nn.Dense(ch, dtype=self.dtype)(h)
            h = _bn(training)(h)
            h = nn.relu(h)
        h = jnp.max(h, axis=1)  # (B, 1024)
        for ch in (512, 256):
            h = nn.Dense(ch, dtype=self.dtype)(h)
            h = _bn(training)(h)
            h = nn.relu(h)
        mat = nn.Dense(self.k * self.k, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros,
                       bias_init=lambda key, shape, dtype=jnp.float32:
                       jnp.eye(self.k, dtype=dtype).reshape(-1))(h)
        return mat.reshape(-1, self.k, self.k)


@MODELS.register_module()
class PointNetEncoder(nn.Module):
    """↔ PointNetEncoder (pointnet.py:90-199).

    ``__call__(pos, x, training)`` returns the seg features (pos, (B,N,1088))
    when ``is_seg`` else the global (B, 1024) cls feature.
    """
    in_channels: int = 3
    input_transform: bool = True
    feature_transform: bool = True
    is_seg: bool = False
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return 1024 + 64 if self.is_seg else 1024

    @nn.compact
    def __call__(self, pos, x=None, training: bool = False):
        x = pos if x is None else x
        if self.input_transform:
            trans = STN(3, dtype=self.dtype, name="stn")(x, training=training)
            xyz = jnp.einsum("bnc,bcd->bnd", x[..., :3], trans)
            x = jnp.concatenate([xyz, x[..., 3:]], axis=-1) \
                if x.shape[-1] > 3 else xyz
        for i in range(2):
            x = nn.Dense(64, dtype=self.dtype, name=f"conv0_{i + 1}")(x)
            x = _bn(training)(x)
            x = nn.relu(x)
        if self.feature_transform:
            trans_feat = STN(64, dtype=self.dtype, name="fstn")(
                x, training=training)
            x = jnp.einsum("bnc,bcd->bnd", x, trans_feat)
        pointfeat = x
        for i, ch in enumerate((64, 128, 1024)):
            x = nn.Dense(ch, dtype=self.dtype, name=f"conv{i + 1}")(x)
            x = _bn(training)(x)
            # reference: no act on the last layer in cls mode (pointnet.py:157)
            if i < 2 or self.is_seg:
                x = nn.relu(x)
        if not self.is_seg:
            return jnp.max(x, axis=1)  # (B, 1024)
        g = jnp.max(x, axis=1, keepdims=True)
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], g.shape[-1]))
        return pos, jnp.concatenate([pointfeat, g], axis=-1)
