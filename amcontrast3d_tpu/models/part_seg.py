"""Part-segmentation and variable-cloud model wrappers + extra seg heads.

↔ ``openpoints/models/segmentation/base_seg.py`` (BasePartSeg :169,
VariableSeg :190, VariableSegHead :270, MultiSegHead :307) and the
PointNeXt part decoder (``backbone/pointnext.py:502-665``).
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .build import MODELS, make_module
from .base_seg import _build_decoder, _build_encoder
from .layers import ConvBlock
from .pointnext import FeaturePropagation, InvResMLP, SegHead, to_full_list


@MODELS.register_module()
class VariableSegHead(nn.Module):
    """↔ VariableSegHead (base_seg.py:270-305): linear-block MLP head for
    packed/variable layouts — on dense tensors it is a SegHead without the
    global-feature option."""
    num_classes: int
    in_channels: int
    norm_args: Any = None
    act_args: Any = None
    dropout: float = 0.5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, training: bool = False, mask=None):
        f = ConvBlock(self.in_channels,
                      norm_args=self.norm_args or {"norm": "bn1d"},
                      act_args=self.act_args or {"act": "relu"},
                      bn_axis_name=self.bn_axis_name,
                      dtype=self.dtype)(f, training=training, mask=mask)
        if self.dropout:
            f = nn.Dropout(self.dropout, deterministic=not training)(f)
        return ConvBlock(self.num_classes, norm_args=None, act_args=None,
                         dtype=self.dtype)(f, training=training)


@MODELS.register_module()
class MultiSegHead(nn.Module):
    """↔ MultiSegHead (base_seg.py:307-355): one small head per shape
    category; returns a list of per-shape part logits."""
    num_classes: int
    in_channels: int
    norm_args: Any = None
    act_args: Any = None
    dropout: float = 0.0
    shape_classes: int = 16
    num_parts: Sequence[int] = (4, 2, 2, 4, 4, 3, 3, 2, 4, 2, 6, 2, 3, 3, 3, 3)
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, training: bool = False) -> List[jnp.ndarray]:
        logits_all_shapes = []
        for i in range(self.shape_classes):
            h = ConvBlock(self.in_channels,
                          norm_args=self.norm_args or {"norm": "bn1d"},
                          act_args=self.act_args or {"act": "relu"},
                          bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                          name=f"head{i}_mlp")(f, training=training)
            if self.dropout:
                h = nn.Dropout(self.dropout, deterministic=not training)(h)
            h = nn.Dense(int(self.num_parts[i]), dtype=self.dtype,
                         name=f"head{i}_out")(h)
            logits_all_shapes.append(h)
        return logits_all_shapes


@MODELS.register_module()
class PointNextPartDecoder(nn.Module):
    """↔ PointNextPartDecoder (pointnext.py:502-665), ``cls_map='pointnet2'``
    path: FP stages with InvResMLP refinement blocks, the one-hot shape label
    lifted to 64 channels and concatenated into the last FP stage."""
    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    decoder_blocks: Sequence[int] = (1, 1, 1, 1)
    decoder_strides: Sequence[int] = (4, 4, 4, 4)
    cls_map: str = "pointnet2"
    num_classes: int = 16
    block: str = "InvResMLP"
    radius: Any = 0.1
    nsample: Any = 16
    radius_scaling: float = 2
    nsample_scaling: float = 1
    expansion: int = 4
    use_res: bool = True
    aggr_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return list(self.encoder_channel_list)[:-1][0]

    @nn.compact
    def __call__(self, p: List, f: List, cls_label, training: bool = False):
        ecl = list(self.encoder_channel_list)
        skip_channels = ecl[:-1]
        fp_channels = ecl[:-1]
        n = len(fp_channels)
        radii = to_full_list(self.radius, self.decoder_blocks,
                             self.decoder_strides, self.radius_scaling)
        nsamples = to_full_list(self.nsample, self.decoder_blocks,
                                self.decoder_strides, self.nsample_scaling)
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "relu"}

        # one-hot shape label → 64 channels (pointnext.py:639-642)
        B, N = p[1].shape[0], p[1].shape[1]
        onehot = jax.nn.one_hot(cls_label.reshape(B), self.num_classes,
                                dtype=jnp.float32)
        cls_feat = nn.Dense(64, dtype=self.dtype, name="convc")(onehot)
        cls_feat = nn.relu(cls_feat)
        cls_feat = jnp.broadcast_to(cls_feat[:, None, :], (B, N, 64))

        f = list(f)
        in_ch = ecl[-1]
        mlps = {}
        for i in range(-1, -n - 1, -1):
            extra = 64 if i == -n else 0
            mlps[i] = [skip_channels[i] + extra + in_ch] + \
                [fp_channels[i]] * self.decoder_layers
            in_ch = fp_channels[i]

        for i in range(-1, -n, -1):
            f[i - 1] = FeaturePropagation(
                mlps[i], norm_args=norm_args, act_args=act_args,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"fp{n + i}",
            )([p[i - 1], f[i - 1]], [p[i], f[i]], training=training)
            for j in range(1, self.decoder_blocks[i]):
                ga = dict(self.group_args or {"NAME": "ballquery"})
                ga["radius"] = radii[i][j]
                ga["nsample"] = nsamples[i][j]
                _, f[i - 1] = InvResMLP(
                    in_channels=fp_channels[i], aggr_args=self.aggr_args,
                    norm_args=norm_args, act_args=act_args, group_args=ga,
                    conv_args=self.conv_args, expansion=self.expansion,
                    use_res=self.use_res, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, name=f"dec{n + i}_block{j}",
                )(p[i - 1], f[i - 1], training=training)

        # last stage concatenates the lifted shape label (pointnext.py:662-663)
        f1 = jnp.concatenate([cls_feat, f[1]], axis=-1)
        out = FeaturePropagation(
            mlps[-n], norm_args=norm_args, act_args=act_args,
            bn_axis_name=self.bn_axis_name, dtype=self.dtype, name="fp0",
        )([p[1], f1], [p[2], f[2]], training=training)
        return out


@MODELS.register_module()
class BasePartSeg(nn.Module):
    """↔ BasePartSeg (base_seg.py:169-187): encoder → part decoder(+shape
    label) → head."""
    encoder_args: Any
    decoder_args: Any = None
    cls_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = _build_encoder(self.encoder_args, self.bn_axis_name,
                                      self.dtype)
        if self.decoder_args is not None:
            merged = dict(self.encoder_args)
            merged.update(dict(self.decoder_args))
            merged.pop("NAME", None)
            merged["encoder_channel_list"] = self.encoder.channel_list
            self.decoder = make_module(PointNextPartDecoder, merged,
                                       bn_axis_name=self.bn_axis_name,
                                       dtype=self.dtype)
        else:
            self.decoder = None
        ca = dict(self.cls_args)
        ca.pop("NAME", None)
        if self.decoder is not None:
            ca["in_channels"] = self.decoder.out_channels
        else:
            ca["in_channels"] = self.encoder.out_channels
        head_cls = MODELS.get(dict(self.cls_args).get("NAME", "SegHead")) or SegHead
        self.head = make_module(head_cls, ca, bn_axis_name=self.bn_axis_name,
                                dtype=self.dtype)

    def __call__(self, pos, features, cls_label, training: bool = False):
        p, f = self.encoder(pos, features, training=training)
        if self.decoder is not None:
            f = self.decoder(p, f, cls_label, training=training)
        elif isinstance(f, list):
            f = f[-1]
        return self.head(f, training=training)


@MODELS.register_module()
class VariableSeg(nn.Module):
    """↔ VariableSeg (base_seg.py:190-204): the packed / variable-cloud
    segmentation model.

    The reference consumes the CUDA pointops offset layout (flat
    ``(n_total, …)`` + per-cloud offsets — upstream it is actually dead code:
    no encoder in the fork implements the 3-tuple ``forward_seg_feat(data)``
    it calls).  TPU-first, the same semantics run on dense bucket-padded
    batches with per-cloud ``n_valid`` counts (fixed shapes): neighbor
    queries exclude padded points exactly (pushed out of range), FPS samples
    ``n_valid // stride`` real points per cloud (prefix-consistency makes the
    fixed-shape tail harmless), and all BatchNorm statistics are masked.
    Valid-point outputs are invariant to the padding bucket — see
    tests/test_variable_seg.py.  Use ``ops.masked.pack_to_dense`` /
    ``dense_to_pack`` to convert the reference offset layout."""
    encoder_args: Any
    decoder_args: Any = None
    cls_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = _build_encoder(self.encoder_args, self.bn_axis_name,
                                      self.dtype)
        self.decoder = _build_decoder(self.encoder_args, self.decoder_args,
                                      self.encoder, self.bn_axis_name,
                                      self.dtype)
        ca = dict(self.cls_args)
        ca.pop("NAME", None)
        ca["in_channels"] = self.decoder.out_channels
        self.head = make_module(VariableSegHead, ca,
                                bn_axis_name=self.bn_axis_name,
                                dtype=self.dtype)

    def __call__(self, pos, features, n_valid=None, training: bool = False):
        """pos (B, Nmax, 3), features (B, Nmax, C), n_valid (B,) int32 counts
        (prefix-valid rows; None = fully dense batch)."""
        if n_valid is None:
            p, f = self.encoder(pos, features, training=training)
            f_out, _, _ = self.decoder(p, f, training=training)
            return self.head(f_out, training=training)
        p, f, nv = self.encoder(pos, features, training=training,
                                n_valid=n_valid)
        f_out, _, _ = self.decoder(p, f, training=training, n_valid_list=nv)
        from ..ops.masked import valid_mask
        mask = valid_mask(n_valid, pos.shape[1])[:, :, None]
        return self.head(f_out, training=training, mask=mask)
