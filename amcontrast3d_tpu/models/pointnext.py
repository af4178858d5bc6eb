"""PointNeXt encoder / decoder / segmentation head (Flax, channels-last).

↔ ``openpoints/models/backbone/pointnext.py`` (the AMContrast3D variants
``pointnext_AA.py`` / ``pointnext_MM.py`` share these blocks; the extra
stage bookkeeping lives in :mod:`amcontrast3d_tpu.models.base_seg`).

TPU-first layout: positions (B, N, 3), features (B, N, C), grouped
neighborhoods (B, M, K, C).  Every 1×1 conv is a Dense on the trailing axis
(MXU); grouping/sampling are the fixed-shape ops from
:mod:`amcontrast3d_tpu.ops`; per-stage point counts are static
(``N_i = N_{i-1} // stride``, mirroring ``p.shape[1] // self.stride`` in
``pointnext.py:146``), so the whole encoder-decoder traces into one XLA graph
with zero dynamic shapes.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import (clamp_members_valid, create_grouper, furthest_point_sample, gather_points,
                   get_aggregation_features, group_points, random_sample,
                   three_interpolation)
from .layers import ConvBlock, MLPBlocks, create_act


def to_full_list(param, blocks: Sequence[int], strides: Sequence[int],
                 param_scaling: float = 1) -> List[List]:
    """Expand a scalar/partial radius or nsample spec into per-block lists
    (↔ ``PointNextEncoder._to_full_list``, pointnext.py:389-407)."""
    param_list: List[List] = []
    if isinstance(param, (list, tuple)):
        for i, value in enumerate(param):
            value = [value] if not isinstance(value, (list, tuple)) else list(value)
            if len(value) != blocks[i]:
                value += [value[-1]] * (blocks[i] - len(value))
            param_list.append(value)
    else:
        for i, stride in enumerate(strides):
            if stride == 1:
                param_list.append([param] * blocks[i])
            else:
                param_list.append([param] + [param * param_scaling] * (blocks[i] - 1))
                param *= param_scaling
    return param_list


# eval-time cap on the materialized (B, M, K, C) grouped tensor: above it
# the separable tail runs in query chunks (inference BN is a pure affine, so
# chunking is exact).  Whole-room rungs past ~800k points otherwise gather
# multi-GB neighborhoods and exhaust HBM.
_EVAL_GATHER_BUDGET = 256 * 1024 * 1024


def _grouped_tail(idx, hf, sup, q, dp_dense, bn_fn, act, dp_scale, pool,
                  chunkable: bool, dp_pre=None):
    """gather(hf) + dp-projection + norm + act + pool over K — the memory
    peak of the separable aggregation.  ``chunkable`` (inference, unmasked)
    streams query chunks so the (B, M, K, C) tensor never materializes
    whole.  ``dp_pre``: precomputed raw (B, M, K, 3) relative positions
    (consecutive blocks of a stage share them — saves one (B·M·K, 3)
    gather per block)."""
    B, M, K = idx.shape
    C = hf.shape[-1]
    nbytes = B * M * K * C * 4

    def tail(idx_c, q_c, dp_c):
        hj = group_points(hf, idx_c)
        dp = (group_points(sup, idx_c) - q_c[:, :, None, :]
              if dp_c is None else dp_c)
        if dp_scale is not None:
            dp = dp / dp_scale
        h = hj + dp_dense(dp)
        h = bn_fn(h)
        if act is not None:
            h = act(h)
        return pool(h)

    if not chunkable or nbytes <= _EVAL_GATHER_BUDGET:
        return tail(idx, q, dp_pre)
    n_chunks = -(-nbytes // _EVAL_GATHER_BUDGET)
    mc = -(-M // n_chunks)
    outs = [tail(idx[:, s:s + mc], q[:, s:s + mc],
                 None if dp_pre is None else dp_pre[:, s:s + mc])
            for s in range(0, M, mc)]
    return jnp.concatenate(outs, axis=1)


def _pool(reduction: str):
    reduction = "mean" if reduction.lower() == "avg" else reduction.lower()
    if reduction == "max":
        return lambda x: jnp.max(x, axis=-2)
    if reduction == "mean":
        return lambda x: jnp.mean(x, axis=-2)
    if reduction == "sum":
        return lambda x: jnp.sum(x, axis=-2)
    raise ValueError(reduction)


# activations that commute with a per-channel max through a monotone
# (sign-adjusted) affine: nondecreasing everywhere
_MONOTONE_ACTS = {None, "relu", "relu6", "leakyrelu", "elu", "sigmoid",
                  "tanh"}


class GroupStatsBN(nn.Module):
    """BatchNorm + activation + max-pool over the VIRTUAL grouped tensor
    ``h[b, i, k, c] = u[idx[b, i, k]] − qp[b, i]`` without materializing it
    (see ops/aggregate_pallas).  The kernel returns the per-query signed
    extremum and slot moments; batch statistics reconstruct in closed form
    and the pooled output is ``act(affine(h_ext))`` — exact because the
    post-BN affine is monotone per channel in the extremum's direction.

    Declares the exact parameter/stat tree of the ``nn.BatchNorm`` it
    replaces (instantiate with ``name='BatchNorm_0'`` so checkpoints are
    backend-invariant); statistics/update formulas mirror flax
    (fast variance, momentum·ra + (1−momentum)·batch, single pmean of the
    concatenated [mean, mean²] under ``axis_name`` — SyncBN)."""
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, sup_p, q_p, u, qp, idx, radius, act):
        from jax import lax
        import jax
        from ..ops.aggregate_pallas import grouped_slot_reduce
        C = u.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, jnp.float32), (C,))
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, jnp.float32), (C,))
        sgn = jnp.where(lax.stop_gradient(scale) >= 0, 1.0, -1.0)
        interpret = jax.default_backend() != "tpu"
        qp32 = qp.astype(jnp.float32)
        if self.use_running_average:
            ext, _, _ = grouped_slot_reduce(
                sup_p, q_p, u, idx, sgn, radius=radius, need_stats=False,
                interpret=interpret)
            mean, var = ra_mean.value, ra_var.value
        else:
            # the kernel subtracts qp per query slot BEFORE the moment
            # accumulation (h-space) — reconstructing E[h²] from u-moments
            # cancels catastrophically (|h| ≪ |u|) and visibly perturbs
            # deep-stack losses
            ext, su, sq = grouped_slot_reduce(
                sup_p, q_p, u, idx, sgn, radius=radius, qp=qp32,
                interpret=interpret)
            B, M, K = idx.shape
            n = B * M * K
            mean = jnp.sum(su, axis=(0, 1)) / n
            mu2 = jnp.sum(sq, axis=(0, 1)) / n
            if self.axis_name is not None and not self.is_initializing():
                conc = lax.pmean(jnp.concatenate([mean, mu2]),
                                 axis_name=self.axis_name)
                mean, mu2 = jnp.split(conc, 2)
            var = jnp.maximum(mu2 - mean * mean, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var)
        h_ext = ext - qp32
        mul = lax.rsqrt(var + self.epsilon) * scale
        y = (h_ext - mean) * mul + bias
        return act(y) if act is not None else y


class LocalAggregation(nn.Module):
    """Group → per-neighbor MLP → pool (↔ pointnext.py:27-78).

    ``separable=True`` (default for the single-layer 'dp_fj' case) computes
    the first conv as ``W·[dp; fj] = W_dp·dp + gather(W_f·f)`` — the feature
    half of the matmul runs once per POINT instead of once per neighbor
    (K× fewer MXU flops, one less (B, M, K, C) concat round-trip through
    HBM); mathematically identical up to float associativity.
    """
    channels: Sequence[int]
    norm_args: Any = None
    act_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    feature_type: str = "dp_fj"
    reduction: str = "max"
    last_act: bool = True
    separable: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, training: bool = False, n_valid=None,
                 cached_idx=None):
        """``cached_idx``: precomputed grouping indices — consecutive blocks
        of one encoder stage share identical (points, radius, nsample), and
        both this ball query and the reference CUDA kernel are deterministic,
        so reusing the first block's result is bit-identical.  May be an
        ``(idx, dp)`` tuple to also share the raw gathered relative
        positions."""
        cached_dp = None
        if isinstance(cached_idx, tuple):
            cached_idx, cached_dp = cached_idx
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        out_channels = list(self.channels[1:])
        grouper = create_grouper(self.group_args)
        # variable/packed path: invalid support can never enter a ball/kNN
        # set (pushed far), and BN statistics exclude padded rows
        sup = p
        bn_mask = None
        if n_valid is not None:
            from ..ops.masked import mask_positions_far, valid_mask
            vm = valid_mask(n_valid, p.shape[1])
            sup = mask_positions_far(p, vm)
            bn_mask = vm[:, :, None, None]
        use_separable = (self.separable and self.feature_type == "dp_fj"
                         and len(out_channels) == 1
                         and order == "conv-norm-act"
                         and _norm_name_local(self.norm_args) is not None
                         and grouper.method in ("ballquery", "knn"))
        if not use_separable:
            dp, fj = grouper(p, sup, f, n_valid=n_valid)
            fj = get_aggregation_features(p, dp, f, fj, self.feature_type)
            fj = MLPBlocks(out_channels, norm_args=self.norm_args,
                           act_args=self.act_args, order=order,
                           last_act=self.last_act,
                           bn_axis_name=self.bn_axis_name,
                           dtype=self.dtype)(fj, training=training,
                                             mask=bn_mask)
            return _pool(self.reduction)(fj)

        from ..ops import ball_query, group_points, knn
        from ..ops.aggregate_pallas import agg_fused_enabled
        out_ch = out_channels[0]
        if cached_idx is not None:
            idx = cached_idx
        elif grouper.method == "ballquery":
            idx = ball_query(sup, p, grouper.radius, grouper.nsample)
            idx = clamp_members_valid(idx, n_valid)
        else:
            idx, _ = knn(sup, p, grouper.nsample)
            idx = clamp_members_valid(idx, n_valid)
        # W_f·f once per point, then gather the projected features
        hf = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                      name="w_f")(f)
        # fp32 precision: the fused tail forms the dp contribution as
        # W·p_j − W·p_i — at default (bf16-input) precision each term
        # carries ~4e-3·|W·p| rounding and the difference swamps the
        # |W·dp| ≤ radius·|W| signal (measured 3e-2 divergence vs the
        # gather tail's W·(p_j−p_i)); fp32 makes the cancellation benign
        # (~1e-7) at negligible cost (one (N,3)@(3,C) matmul per block)
        dp_dense = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                            name="w_dp", precision=jax.lax.Precision.HIGHEST)
        act = create_act(self.act_args) if self.last_act else None
        dp_scale = (grouper.radius if grouper.normalize_dp
                    and grouper.method == "ballquery" else None)
        from ..ops.aggregate_pallas import agg_fused_fits
        from .layers import _act_name
        if (agg_fused_enabled() and bn_mask is None
                and self.reduction.lower() == "max"
                and agg_fused_fits(p.shape[1], out_ch, idx.shape[-1])
                and (not self.last_act
                     or _act_name(self.act_args) in _MONOTONE_ACTS)):
            # slot one-hot gather-reduce: no grouped tensor, no scatter
            proj = dp_dense(p)
            if dp_scale is not None:
                proj = proj * (1.0 / dp_scale)
            u = hf + proj
            bn_mod = GroupStatsBN(use_running_average=not training,
                                  momentum=0.9, epsilon=1e-5,
                                  axis_name=self.bn_axis_name,
                                  name="BatchNorm_0")
            radius = (grouper.radius if grouper.method == "ballquery"
                      else None)
            return bn_mod(p, p, u, proj, idx, radius, act)
        bn = (nn.BatchNorm(use_running_average=not training, momentum=0.9,
                           epsilon=1e-5, axis_name=self.bn_axis_name,
                           dtype=jnp.float32)
              if _norm_name_local(self.norm_args) is not None else None)
        return _grouped_tail(
            idx, hf, p, p, dp_dense,
            (lambda t: bn(t, mask=bn_mask)) if bn is not None else (lambda t: t),
            act, dp_scale, _pool(self.reduction),
            chunkable=not training and bn_mask is None,
            dp_pre=cached_dp)


def _norm_name_local(norm_args):
    from .layers import _norm_name
    return _norm_name(norm_args)


class SetAbstraction(nn.Module):
    """Downsampling set abstraction with optional residual
    (↔ pointnext.py:81-170)."""
    in_channels: int
    out_channels: int
    layers: int = 1
    stride: int = 1
    group_args: Any = None
    norm_args: Any = None
    act_args: Any = None
    conv_args: Any = None
    sampler: str = "fps"
    feature_type: str = "dp_fj"
    use_res: bool = False
    is_head: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, training: bool = False, n_valid=None):
        all_aggr = not self.is_head and self.stride == 1
        use_res = self.use_res and not all_aggr and not self.is_head
        order = (self.conv_args or {}).get("order", "conv-norm-act")

        mid = self.out_channels // 2 if self.stride > 1 else self.out_channels
        channels = [self.in_channels] + [mid] * (self.layers - 1) + [self.out_channels]

        if self.is_head:
            # stem MLP: no norm, no act (pointnext.py:119-127 with is_head)
            for ch in channels[1:]:
                f = ConvBlock(ch, norm_args=None, act_args=None, order=order,
                              dtype=self.dtype)(f, training=training)
            return (p, f) if n_valid is None else (p, f, n_valid)

        new_n_valid = None
        if n_valid is not None and all_aggr:
            raise NotImplementedError("masked global aggregation")
        if not all_aggr:
            npoint = p.shape[1] // self.stride
            if n_valid is not None:
                from ..ops.masked import fps_masked, stride_counts
                # per-cloud subsampled size = n_valid // stride (the
                # reference's variable-FPS offset arithmetic); FPS is
                # prefix-consistent so rows ≥ that count are simply unused
                idx = fps_masked(p, npoint, n_valid)
                new_n_valid = jnp.minimum(stride_counts(n_valid, self.stride),
                                          npoint)
            elif self.sampler.lower() == "fps":
                idx = furthest_point_sample(p, npoint)
            else:
                idx = random_sample(p, npoint, self.make_rng("sampling"))
            new_p = gather_points(p, idx)
        else:
            idx = None
            new_p = p

        if use_res or "df" in self.feature_type:
            fi = gather_points(f, idx) if idx is not None else f
        else:
            fi = None
        if use_res:
            if self.in_channels != channels[-1]:
                identity = ConvBlock(channels[-1], norm_args=None, act_args=None,
                                     dtype=self.dtype)(fi, training=training)
            else:
                identity = fi

        ga = dict(self.group_args or {})
        if all_aggr:
            ga["nsample"] = None
            ga["radius"] = None
        grouper = create_grouper(ga)

        sup = p
        bn_mask = None
        if n_valid is not None:
            from ..ops.masked import mask_positions_far, valid_mask
            sup = mask_positions_far(p, valid_mask(n_valid, p.shape[1]))
            bn_mask = valid_mask(new_n_valid, new_p.shape[1])[:, :, None, None]

        use_separable = (not all_aggr and self.feature_type == "dp_fj"
                         and len(channels) == 2
                         and order == "conv-norm-act"
                         and _norm_name_local(self.norm_args) is not None
                         and grouper.method in ("ballquery", "knn"))
        if use_separable:
            # W·[dp; fj] = W_dp·dp + gather(W_f·f): project features once per
            # SUPPORT point (pre-downsample), gather the projection
            from ..ops import ball_query, group_points, knn
            out_ch = channels[-1]
            if grouper.method == "ballquery":
                gidx = ball_query(sup, new_p, grouper.radius, grouper.nsample)
            else:
                gidx, _ = knn(sup, new_p, grouper.nsample)
            gidx = clamp_members_valid(gidx, n_valid)
            hf = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                          name="w_f")(f)
            # fp32: see LocalAggregation — the fused tail's W·p_j − W·p_i
            # cancellation needs better-than-bf16 terms
            dp_dense = nn.Dense(out_ch, use_bias=False, dtype=self.dtype,
                                name="w_dp",
                                precision=jax.lax.Precision.HIGHEST)
            act = None if use_res else create_act(self.act_args)
            dp_scale = (grouper.radius if grouper.normalize_dp
                        and grouper.method == "ballquery" else None)
            from ..ops.aggregate_pallas import agg_fused_enabled, agg_fused_fits
            from .layers import _act_name
            if (agg_fused_enabled() and bn_mask is None
                    and agg_fused_fits(p.shape[1], out_ch, gidx.shape[-1])
                    and (act is None
                         or _act_name(self.act_args) in _MONOTONE_ACTS)):
                proj = dp_dense(p)
                if dp_scale is not None:
                    proj = proj * (1.0 / dp_scale)
                u = hf + proj
                qproj = dp_dense(new_p)
                if dp_scale is not None:
                    qproj = qproj * (1.0 / dp_scale)
                bn_mod = GroupStatsBN(use_running_average=not training,
                                      momentum=0.9, epsilon=1e-5,
                                      axis_name=self.bn_axis_name,
                                      name="BatchNorm_0")
                radius = (grouper.radius if grouper.method == "ballquery"
                          else None)
                f = bn_mod(p, new_p, u, qproj, gidx, radius, act)
            else:
                bn = nn.BatchNorm(use_running_average=not training,
                                  momentum=0.9, epsilon=1e-5,
                                  axis_name=self.bn_axis_name,
                                  dtype=jnp.float32)
                f = _grouped_tail(
                    gidx, hf, sup, new_p, dp_dense,
                    lambda t: bn(t, mask=bn_mask), act, dp_scale,
                    lambda t: jnp.max(t, axis=-2),
                    chunkable=not training and bn_mask is None)
        else:
            dp, fj = grouper(new_p, sup, f, n_valid=n_valid)
            fj = get_aggregation_features(new_p, dp, fi, fj, self.feature_type)
            n_conv = len(channels) - 1
            for i, ch in enumerate(channels[1:]):
                last = i == n_conv - 1
                fj = ConvBlock(ch, norm_args=self.norm_args,
                               act_args=None if (last and use_res) else self.act_args,
                               order=order, bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype)(fj, training=training,
                                                 mask=bn_mask)
            f = jnp.max(fj, axis=-2)
        if use_res:
            act = create_act(self.act_args)
            f = act(f + identity)
        return (new_p, f) if n_valid is None else (new_p, f, new_n_valid)


class FeaturePropagation(nn.Module):
    """3-NN upsampling + MLP (↔ FeaturePropogation, pointnext.py:173-226)."""
    mlp: Sequence[int]          # [skip + coarse, fp, fp]
    upsample: bool = True
    norm_args: Any = None
    act_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pf1, pf2=None, training: bool = False, n_valid=None):
        """``n_valid``: optional (fine_counts, coarse_counts) pair for the
        variable/packed path — invalid coarse points are pushed out of the
        3-NN sets and padded fine rows are excluded from BN statistics."""
        if not self.upsample:
            if n_valid is not None:
                raise NotImplementedError("masked global FP")
            _, f = pf1
            f_global = jnp.mean(f, axis=1)  # (B, C)
            g = nn.Dense(self.mlp[1], dtype=self.dtype)(f_global)
            g = nn.relu(g)
            g = jnp.broadcast_to(g[:, None, :], (f.shape[0], f.shape[1], g.shape[-1]))
            f = jnp.concatenate([f, g], axis=-1)
            for ch in self.mlp[2:]:
                f = ConvBlock(ch, norm_args=self.norm_args, act_args=self.act_args,
                              bn_axis_name=self.bn_axis_name,
                              dtype=self.dtype)(f, training=training)
            return f
        p1, f1 = pf1
        p2, f2 = pf2
        bn_mask = None
        if n_valid is not None:
            from ..ops.masked import mask_positions_far, valid_mask
            nv1, nv2 = n_valid
            p2 = mask_positions_far(p2, valid_mask(nv2, p2.shape[1]))
            bn_mask = valid_mask(nv1, p1.shape[1])[:, :, None]
        upsampled = three_interpolation(p1, p2, f2)
        f = jnp.concatenate([f1, upsampled], axis=-1) if f1 is not None else upsampled
        for ch in self.mlp[1:]:
            f = ConvBlock(ch, norm_args=self.norm_args, act_args=self.act_args,
                          bn_axis_name=self.bn_axis_name,
                          dtype=self.dtype)(f, training=training, mask=bn_mask)
        return f


class InvResMLP(nn.Module):
    """Inverted-residual MLP block (↔ pointnext.py:229-276)."""
    in_channels: int
    norm_args: Any = None
    act_args: Any = None
    aggr_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    expansion: int = 1
    use_res: bool = True
    num_posconvs: int = 2
    less_act: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, training: bool = False, n_valid=None,
                 cached_idx=None):
        aggr = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        identity = f
        f = LocalAggregation(
            [self.in_channels, self.in_channels],
            norm_args=self.norm_args,
            act_args=self.act_args if self.num_posconvs > 0 else None,
            group_args=self.group_args, conv_args=self.conv_args,
            feature_type=aggr.get("feature_type", "dp_fj"),
            reduction=aggr.get("reduction", "max"),
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(p, f, training=training, n_valid=n_valid, cached_idx=cached_idx)
        bn_mask = None
        if n_valid is not None:
            from ..ops.masked import valid_mask
            bn_mask = valid_mask(n_valid, p.shape[1])[:, :, None]
        mid = int(self.in_channels * self.expansion)
        if self.num_posconvs < 1:
            channels = []
        elif self.num_posconvs == 1:
            channels = [self.in_channels]
        else:
            channels = [mid, self.in_channels]
        order = (self.conv_args or {}).get("order", "conv-norm-act")
        n = len(channels)
        for i, ch in enumerate(channels):
            last = i == n - 1
            f = ConvBlock(ch, norm_args=self.norm_args,
                          act_args=None if (last and not self.less_act) else self.act_args,
                          order=order, bn_axis_name=self.bn_axis_name,
                          dtype=self.dtype)(f, training=training, mask=bn_mask)
        if f.shape[-1] == identity.shape[-1] and self.use_res:
            f = f + identity
        act = create_act(self.act_args)
        return p, act(f)


class ResBlock(nn.Module):
    """Plain residual local-aggregation block (↔ pointnext.py:279-307)."""
    in_channels: int
    norm_args: Any = None
    act_args: Any = None
    aggr_args: Any = None
    group_args: Any = None
    conv_args: Any = None
    expansion: int = 1
    use_res: bool = True
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, p, f, training: bool = False, n_valid=None):
        aggr = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        identity = f
        mid = self.in_channels * self.expansion
        f = LocalAggregation(
            [self.in_channels, self.in_channels, mid, self.in_channels],
            norm_args=self.norm_args, act_args=None,
            group_args=self.group_args, conv_args=self.conv_args,
            feature_type=aggr.get("feature_type", "dp_fj"),
            reduction=aggr.get("reduction", "max"),
            bn_axis_name=self.bn_axis_name, dtype=self.dtype,
        )(p, f, training=training, n_valid=n_valid)
        if f.shape[-1] == identity.shape[-1] and self.use_res:
            f = f + identity
        act = create_act(self.act_args)
        return p, act(f)


_BLOCKS = {"InvResMLP": InvResMLP, "ResBlock": ResBlock}


class PointNextEncoder(nn.Module):
    """↔ ``PointNextEncoder`` (pointnext.py:311-458) and the AA/MM variants'
    shared encoder body (pointnext_AA.py:312-471)."""
    in_channels: int = 4
    width: int = 32
    blocks: Sequence[int] = (1, 4, 7, 4, 4)
    strides: Sequence[int] = (1, 4, 4, 4, 4)
    block: str = "InvResMLP"
    nsample: Any = 32
    radius: Any = 0.1
    aggr_args: Any = None
    group_args: Any = None
    sa_layers: int = 1
    sa_use_res: bool = False
    norm_args: Any = None
    act_args: Any = None
    conv_args: Any = None
    sampler: str = "fps"
    expansion: int = 4
    use_res: bool = True
    radius_scaling: float = 2
    nsample_scaling: float = 1
    remat: bool = False
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def channel_list(self) -> List[int]:
        width = self.width
        channels = []
        for stride in self.strides:
            if stride != 1:
                width *= 2
            channels.append(width)
        return channels

    @property
    def out_channels(self) -> int:
        return self.channel_list[-1]

    @nn.compact
    def __call__(self, p0, f0, training: bool = False, n_valid=None
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Returns per-stage position / feature lists, index 0 = the input
        (len = num_stages + 1, like ``forward_seg_feat``, pointnext.py:443-455).

        With ``n_valid`` (B,) counts (the variable/packed path) a third list
        of per-stage valid counts is returned as well."""
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "relu"}
        aggr_args = dict(self.aggr_args or {"feature_type": "dp_fj", "reduction": "max"})
        radii = to_full_list(self.radius, self.blocks, self.strides, self.radius_scaling)
        nsamples = to_full_list(self.nsample, self.blocks, self.strides, self.nsample_scaling)
        channels = self.channel_list
        block_cls = _BLOCKS[self.block] if isinstance(self.block, str) else self.block
        sa_cls = SetAbstraction
        if self.remat:
            # rematerialize the grouped (B, N, K, C) neighborhoods in the
            # backward pass — trades recompute for the dominant activation
            # memory (jax.checkpoint; enables ≥2× batch on one chip)
            sa_cls = nn.remat(SetAbstraction, static_argnums=(3,))
            block_cls = nn.remat(block_cls, static_argnums=(3,))

        p_list, f_list = [p0], [f0]
        nv_list = [n_valid]
        in_ch = self.in_channels
        p, f, nv = p0, f0, n_valid
        for i in range(len(self.blocks)):
            is_head = i == 0 and self.strides[i] == 1
            ga = dict(self.group_args or {"NAME": "ballquery"})
            ga["radius"] = radii[i][0]
            ga["nsample"] = nsamples[i][0]
            sa = sa_cls(
                in_channels=in_ch, out_channels=channels[i],
                layers=self.sa_layers if not is_head else 1,
                stride=self.strides[i], group_args=ga,
                norm_args=norm_args, act_args=act_args, conv_args=self.conv_args,
                sampler=self.sampler, use_res=self.sa_use_res, is_head=is_head,
                feature_type=aggr_args.get("feature_type", "dp_fj"),
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"enc{i}_sa",
            )
            if nv is None:
                p, f = sa(p, f, training)
            else:
                p, f, nv = sa(p, f, training, n_valid=nv)
            in_ch = channels[i]
            # consecutive blocks of a stage share (points, radius, nsample):
            # the grouping is deterministic in both this framework and the
            # reference CUDA kernels, so one query serves every block
            shared_idx = None
            nb = self.blocks[i]
            if (nb > 2 and self.block == "InvResMLP"
                    and aggr_args.get("feature_type", "dp_fj") == "dp_fj"
                    and all(radii[i][j] == radii[i][1]
                            and nsamples[i][j] == nsamples[i][1]
                            for j in range(1, nb))):
                from ..ops import ball_query as _bq, knn as _knn
                from ..ops.masked import mask_positions_far, valid_mask
                ga1 = dict(self.group_args or {"NAME": "ballquery"})
                supb = p if nv is None else mask_positions_far(
                    p, valid_mask(nv, p.shape[1]))
                if ga1.get("NAME", "ballquery") == "ballquery":
                    shared_idx = _bq(supb, p, radii[i][1], nsamples[i][1])
                else:
                    shared_idx, _ = _knn(supb, p, nsamples[i][1])
                    from ..ops import clamp_members_valid as _cmv
                    shared_idx = _cmv(shared_idx, nv)
                # blocks also share the raw relative positions (one gather
                # instead of one per block; radius-normalization is
                # identical across the stage and stays in the block) —
                # unless the fused slot-reduce tail is on, which never
                # materializes dp at all
                from ..ops.aggregate_pallas import agg_fused_enabled
                if not agg_fused_enabled():
                    shared_dp = (group_points(p, shared_idx)
                                 - p[:, :, None, :])
                    shared_idx = (shared_idx, shared_dp)
            for j in range(1, self.blocks[i]):
                gaj = dict(self.group_args or {"NAME": "ballquery"})
                gaj["radius"] = radii[i][j]
                gaj["nsample"] = nsamples[i][j]
                block = block_cls(
                    in_channels=in_ch, aggr_args=aggr_args,
                    norm_args=norm_args, act_args=act_args, group_args=gaj,
                    conv_args=self.conv_args, expansion=self.expansion,
                    use_res=self.use_res, bn_axis_name=self.bn_axis_name,
                    dtype=self.dtype, name=f"enc{i}_block{j}",
                )
                if nv is None:
                    p, f = block(p, f, training, cached_idx=shared_idx)
                else:
                    p, f = block(p, f, training, n_valid=nv,
                                 cached_idx=shared_idx)
            p_list.append(p)
            f_list.append(f)
            nv_list.append(nv)
        if n_valid is not None:
            return p_list, f_list, nv_list
        return p_list, f_list


class PointNextDecoder(nn.Module):
    """↔ ``PointNextDecoder`` (pointnext.py:462-498).

    Returns the full-resolution feature map plus the refreshed per-stage
    decoder features (the ``stageACE_list['up'][i]['f_out']`` refresh of
    ``pointnext_AA.py:508-522``) — index s corresponds to encoder stage s+1.

    With ``refine=True`` the AMContrast3D++ masked refinement runs after each
    FP stage (↔ ``PointNextDecoder_M_AMContrast3D.forward_then_AMContrast3D``,
    pointnext_MM.py:519-566): the 'up' feature is recorded *pre*-refine (it
    feeds the contrastive objective) while the refined feature propagates to
    the next FP stage; ``a_list`` supplies per-stage ambiguity (APM or AEF).
    """
    encoder_channel_list: Sequence[int]
    decoder_layers: int = 2
    decoder_stages: int = 4
    in_channels_input: int = 3
    norm_args: Any = None
    act_args: Any = None
    refine: bool = False
    refine_mapping: bool = False
    refine_attention: bool = False
    nsample_k: int = 12
    fusion: str = "MIN"
    threshold: float = 0.7
    threshold_max: float = 1.0
    gamma: float = 0.5
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @property
    def out_channels(self) -> int:
        return list(self.encoder_channel_list)[: self.decoder_stages][0]

    @nn.compact
    def __call__(self, p: List[jnp.ndarray], f: List[jnp.ndarray],
                 a_list: Optional[List[jnp.ndarray]] = None,
                 a_map_list: Optional[List[jnp.ndarray]] = None,
                 training: bool = False,
                 n_valid_list: Optional[List[jnp.ndarray]] = None):
        ecl = list(self.encoder_channel_list)
        skip_channels = ecl[:-1]
        if len(skip_channels) < self.decoder_stages:
            skip_channels.insert(0, self.in_channels_input)
        fp_channels = ecl[: self.decoder_stages]
        norm_args = self.norm_args or {"norm": "bn"}
        act_args = self.act_args or {"act": "relu"}

        n = self.decoder_stages
        f = list(f)
        in_ch = ecl[-1]
        # build stage channel spec in reference order (-1 … -n)
        mlps = {}
        for i in range(-1, -n - 1, -1):
            mlps[i] = [skip_channels[i] + in_ch] + [fp_channels[i]] * self.decoder_layers
            in_ch = fp_channels[i]
        up_features: List[jnp.ndarray] = [None] * n
        refine_rates = []
        for i in range(-1, -n - 1, -1):
            nv_pair = None
            if n_valid_list is not None:
                nv_pair = (n_valid_list[i - 1], n_valid_list[i])
            f[i - 1] = FeaturePropagation(
                mlps[i], norm_args=norm_args, act_args=act_args,
                bn_axis_name=self.bn_axis_name, dtype=self.dtype,
                name=f"fp{n + i}",
            )([p[i - 1], f[i - 1]], [p[i], f[i]], training=training,
              n_valid=nv_pair)
            up_features[i] = f[i - 1]
            if self.refine and a_list is not None:
                from .refine import dual_masks, map_sum
                if self.refine_mapping:
                    # Map* variants consume the APM's lifted ambiguity map
                    # (MaskedRefine.py:22-43); the attention variant is a
                    # trained cross-attention here (the reference instantiates
                    # an untrained layer per forward — documented deviation).
                    if self.refine_attention:
                        from .apm import Attention
                        d = f[i - 1].shape[-1]
                        f[i - 1] = Attention(d, d, d, dtype=self.dtype,
                                             name=f"refine_att{n + i}")(
                            a_map_list[i], f[i - 1])
                    else:
                        f[i - 1] = map_sum(f[i - 1], a_map_list[i])
                else:
                    f[i - 1], rate = dual_masks(
                        p[i - 1], f[i - 1], a_list[i], self.nsample_k,
                        self.fusion, self.threshold, self.threshold_max,
                        self.gamma)
                    refine_rates.append(rate)
        if self.refine and refine_rates:
            avg_rate = jnp.mean(jnp.stack(refine_rates))
        else:
            avg_rate = jnp.zeros(())
        return f[-n - 1], up_features, avg_rate


class SegHead(nn.Module):
    """Scene segmentation head (↔ ``SegHead``, base_seg.py:207-267)."""
    num_classes: int
    in_channels: int
    mlps: Any = None
    norm_args: Any = None
    act_args: Any = None
    dropout: float = 0.5
    global_feat: Optional[str] = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f, training: bool = False):
        norm_args = self.norm_args or {"norm": "bn1d"}
        act_args = self.act_args or {"act": "relu"}
        in_ch = self.in_channels
        if self.global_feat is not None:
            feats = [f]
            for ft in self.global_feat.split(","):
                if "max" in ft:
                    g = jnp.max(f, axis=1, keepdims=True)
                elif ft in ("avg", "mean"):
                    g = jnp.mean(f, axis=1, keepdims=True)
                else:
                    raise ValueError(ft)
                feats.append(jnp.broadcast_to(g, f.shape))
            f = jnp.concatenate(feats, axis=-1)
            in_ch = f.shape[-1]
        if self.mlps is None:
            mlps = [in_ch, in_ch, self.num_classes]
        else:
            m = self.mlps if isinstance(self.mlps, (list, tuple)) else [self.mlps]
            mlps = [in_ch] + list(m) + [self.num_classes]
        for ch in mlps[1:-1]:
            f = ConvBlock(ch, norm_args=norm_args, act_args=act_args,
                          bn_axis_name=self.bn_axis_name,
                          dtype=self.dtype)(f, training=training)
            if self.dropout:
                f = nn.Dropout(self.dropout, deterministic=not training)(f)
        logits = ConvBlock(mlps[-1], norm_args=None, act_args=None,
                           dtype=self.dtype)(f, training=training)
        return logits
