"""NN layer library (Flax): conv-block / norm / act factories.

↔ ``openpoints/models/layers/{conv,norm,activation}.py``.  The reference's
1×1 ``Conv1d``/``Conv2d`` over channels-first tensors become ``nn.Dense``
over channels-last tensors — identical math, and the (…, C_in) @ (C_in, C_out)
contraction maps straight onto the MXU with C on the lane dimension.

Norm semantics: ``bn``/``bn1d``/``bn2d`` → ``nn.BatchNorm`` reducing over all
axes except the trailing channel axis (equivalent to torch BatchNorm1d/2d on
(B, C, N)/(B, C, M, K)); momentum 0.9 (= 1 − torch's 0.1), eps 1e-5.  Pass
``bn_axis_name`` to average batch statistics across a mesh axis — the
TPU-native SyncBatchNorm (reference converts all BN to SyncBN under DDP,
``main_AA.py:146-148``).

Bias handling matches ``create_convblock*`` (conv.py:24-105): the conv bias is
dropped whenever a norm layer follows.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def _norm_name(norm_args) -> Optional[str]:
    if norm_args is None:
        return None
    if isinstance(norm_args, str):
        return norm_args.lower()
    name = dict(norm_args).get("norm", None)
    return name.lower() if name is not None else None


def _act_name(act_args) -> Optional[str]:
    if act_args is None:
        return None
    if isinstance(act_args, str):
        return act_args.lower()
    name = dict(act_args).get("act", None)
    return name.lower() if name is not None else None


_ACTS: dict = {}


def create_act(act_args) -> Optional[Callable]:
    """↔ ``create_act`` (activation.py:25-57)."""
    name = _act_name(act_args)
    if name is None:
        return None
    table = {
        "relu": nn.relu,
        "relu6": nn.relu6,
        "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
        "elu": nn.elu,
        "gelu": nn.gelu,
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "silu": nn.silu,
        "swish": nn.silu,
        "hardswish": nn.hard_swish,
        "softmax": nn.softmax,
    }
    if name not in table:
        raise ValueError(f"activation {name} not supported")
    return table[name]


class ConvBlock(nn.Module):
    """Dense (+Norm) (+Act) with configurable order (↔ create_convblock1d/2d).

    Works on any (..., C) tensor: (B, N, C) replaces torch (B, C, N) conv1d;
    (B, M, K, C) replaces torch (B, C, M, K) conv2d — the norm reduction axes
    are equivalent because BatchNorm reduces everything but the channel axis.
    """
    out_channels: int
    norm_args: Any = None
    act_args: Any = None
    order: str = "conv-norm-act"
    bias: bool = True
    bn_momentum: float = 0.9
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, mask=None):
        """``mask`` (broadcastable to x, True = real point) excludes padded
        rows from the BatchNorm statistics — the variable/packed path."""
        norm = _norm_name(self.norm_args)
        act = create_act(self.act_args)
        use_bias = self.bias and norm is None

        def apply_norm(y):
            if norm is None:
                return y
            if norm.startswith("bn") or norm.startswith("syncbn"):
                return nn.BatchNorm(
                    use_running_average=not training,
                    momentum=self.bn_momentum,
                    epsilon=1e-5,
                    axis_name=self.bn_axis_name,
                    dtype=jnp.float32,
                )(y, mask=mask)
            if norm.startswith("ln"):
                return nn.LayerNorm(epsilon=1e-6)(y)
            if norm.startswith("gn"):
                return nn.GroupNorm(num_groups=min(32, y.shape[-1]))(y)
            raise ValueError(f"norm {norm} not supported")

        dense = nn.Dense(self.out_channels, use_bias=use_bias, dtype=self.dtype)

        if self.order == "conv-norm-act":
            x = dense(x)
            x = apply_norm(x)
            if act is not None:
                x = act(x)
        elif self.order == "norm-act-conv":
            x = apply_norm(x)
            if act is not None:
                x = act(x)
            x = dense(x)
        elif self.order == "conv-act-norm":
            x = dense(x)
            if act is not None:
                x = act(x)
            x = apply_norm(x)
        else:
            raise NotImplementedError(f"order {self.order} not supported")
        return x


class MLPBlocks(nn.Module):
    """A stack of ConvBlocks following a channel list (last act optional)."""
    channels: Sequence[int]
    norm_args: Any = None
    act_args: Any = None
    order: str = "conv-norm-act"
    last_act: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False, mask=None):
        n = len(self.channels)
        for i, ch in enumerate(self.channels):
            is_last = i == n - 1
            x = ConvBlock(
                ch,
                norm_args=self.norm_args,
                act_args=None if (is_last and not self.last_act) else self.act_args,
                order=self.order,
                bn_axis_name=self.bn_axis_name,
                dtype=self.dtype,
            )(x, training=training, mask=mask)
        return x
