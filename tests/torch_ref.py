"""Load the torch reference (``/root/reference/openpoints``) on CPU.

The reference's compiled CUDA extensions are replaced with wrappers that call
THIS repo's jax ops (exact backends), so both frameworks see bit-identical
samplings/neighborhoods and the parity tests isolate what they are meant to
check: network math and weight-transplant correctness.  Op-level parity with
the CUDA kernels' semantics is covered separately by the oracle tests in
``tests/test_ops.py``.

Also provides the weight transplant: torch module tree → flax params /
batch_stats for the repo's channels-last models, including the split of the
fused ``W·[dp; fj]`` conv into the separable ``w_dp`` / ``w_f`` pair
(mathematically identical reformulation, see models/pointnext.py:60-126).
"""
from __future__ import annotations

import os
import sys
import types

import numpy as np

os.environ.setdefault("AMC3D_KNN_BACKEND", "exact")

REF = "/root/reference"
available = os.path.isdir(os.path.join(REF, "openpoints"))

_cache = {}


def _install_stubs():
    import torch

    def stub(name, **attrs):
        if name in sys.modules:
            return
        m = types.ModuleType(name)
        m.__dict__.update(attrs)
        sys.modules[name] = m

    # EasyConfig.update is overloaded via @multimethod on the second-arg
    # annotation (Dict vs List); a pass-through decorator would let the last
    # overload shadow the dict one, so dispatch for real.
    class _MultiMethod:
        _registry = {}

        def __init__(self, func):
            self._key = func.__qualname__
            self._registry.setdefault(self._key, []).append(func)
            self.__name__ = func.__name__

        def __get__(self, obj, objtype=None):
            funcs = self._registry[self._key]

            def bound(*args, **kw):
                import inspect
                import typing
                for f in funcs:
                    params = list(inspect.signature(f).parameters.values())
                    if len(params) >= 2 and args:
                        ann = params[1].annotation
                        if typing.get_origin(ann) is typing.Union:
                            cand = typing.get_args(ann)
                        else:
                            cand = (ann,)
                        cand = tuple(typing.get_origin(t) or t for t in cand)
                        try:
                            if isinstance(args[0], cand):
                                return f(obj, *args, **kw)
                        except TypeError:
                            continue
                return funcs[-1](obj, *args, **kw)

            return bound

    stub("multimethod", multimethod=_MultiMethod)
    stub("shortuuid", uuid=lambda: "parity00")
    stub("termcolor", colored=lambda s, *a, **k: s)

    class _EasyDict(dict):
        def __init__(self, d=None, **kw):
            super().__init__()
            for k, v in {**(d or {}), **kw}.items():
                self[k] = v

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError:
                raise AttributeError(k)

        __setattr__ = dict.__setitem__

    stub("easydict", EasyDict=_EasyDict)

    # ---- CPU stand-ins for the torch.cuda allocators the reference's
    # autograd forwards call directly
    def _float(*shape, device=None):
        return torch.empty(tuple(int(s) for s in shape), dtype=torch.float32)

    def _int(*shape, device=None):
        return torch.zeros(tuple(int(s) for s in shape), dtype=torch.int32)

    torch.cuda.FloatTensor = _float
    torch.cuda.IntTensor = _int
    # the AA encoder builds offsets via torch.IntTensor([...]).cuda()
    # (pointnext_AA.py:461) — make .cuda() a no-op on CPU
    torch.Tensor.cuda = lambda self, *a, **k: self
    # ThreeInterpolate.backward allocates with a hard-coded device='cuda'
    # (upsampling.py:82) — downgrade just that case so the reference can
    # also TRAIN on CPU (the eval-seam test briefly fits it to the fixture)
    if not getattr(torch.zeros, "_amc3d_cpu_patch", False):
        _orig_zeros = torch.zeros

        def _zeros(*a, **k):
            if str(k.get("device")) == "cuda":
                k["device"] = "cpu"
            return _orig_zeros(*a, **k)

        _zeros._amc3d_cpu_patch = True
        torch.zeros = _zeros


def _install_fake_extensions():
    import jax.numpy as jnp
    import torch

    from amcontrast3d_tpu.ops import ball_query as our_ball_query
    from amcontrast3d_tpu.ops import furthest_point_sample as our_fps
    from amcontrast3d_tpu.ops import knn as our_knn
    from amcontrast3d_tpu.ops import three_nn as our_three_nn

    def _np(t):
        return np.ascontiguousarray(t.detach().numpy())

    pn2 = types.ModuleType("pointnet2_batch_cuda")

    def furthest_point_sampling_wrapper(B, N, npoint, xyz, temp, output):
        idx = np.asarray(our_fps(jnp.asarray(_np(xyz)), int(npoint)))
        output.copy_(torch.from_numpy(idx.astype(np.int32)))

    def gather_points_wrapper(B, C, N, npoint, features, idx, output):
        out = torch.gather(features, 2,
                           idx.long().unsqueeze(1).expand(B, C, npoint))
        output.copy_(out)

    def group_points_wrapper(B, C, N, nfeatures, nsample, features, idx,
                             output):
        flat = idx.long().reshape(B, 1, nfeatures * nsample).expand(B, C, -1)
        out = torch.gather(features, 2, flat).reshape(B, C, nfeatures, nsample)
        output.copy_(out)

    def ball_query_wrapper(B, N, npoint, radius, nsample, new_xyz, xyz, idx):
        out = np.asarray(our_ball_query(jnp.asarray(_np(xyz)),
                                        jnp.asarray(_np(new_xyz)),
                                        float(radius), int(nsample)))
        idx.copy_(torch.from_numpy(out.astype(np.int32)))

    def three_nn_wrapper(B, N, m, unknown, known, dist2, idx):
        d, i = our_three_nn(jnp.asarray(_np(unknown)), jnp.asarray(_np(known)))
        dist2.copy_(torch.from_numpy(np.asarray(d, np.float32) ** 2))
        idx.copy_(torch.from_numpy(np.asarray(i).astype(np.int32)))

    def three_interpolate_wrapper(B, c, m, n, features, idx, weight, output):
        flat = idx.long().reshape(B, 1, n * 3).expand(B, c, -1)
        neigh = torch.gather(features, 2, flat).reshape(B, c, n, 3)
        output.copy_((neigh * weight.unsqueeze(1)).sum(-1))

    # ---- backward wrappers (scatter-adds) so the reference model can also
    # train on CPU (GroupingOperation/GatherOperation/ThreeInterpolate
    # backward, cpp/pointnet2_batch/src/*_gpu.cu grad kernels)
    def gather_points_grad_wrapper(B, C, N, npoint, grad_out, idx,
                                   grad_features):
        flat = idx.long().unsqueeze(1).expand(B, C, npoint)
        grad_features.scatter_add_(2, flat, grad_out)

    def group_points_grad_wrapper(B, C, N, npoint, nsample, grad_out, idx,
                                  grad_features):
        flat = idx.long().reshape(B, 1, npoint * nsample).expand(B, C, -1)
        grad_features.scatter_add_(
            2, flat, grad_out.reshape(B, C, npoint * nsample))

    def three_interpolate_grad_wrapper(B, c, n, m, grad_out, idx, weight,
                                       grad_features):
        contrib = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B,c,n,3)
        flat = idx.long().reshape(B, 1, n * 3).expand(B, c, -1)
        grad_features.scatter_add_(2, flat, contrib.reshape(B, c, n * 3))

    pn2.furthest_point_sampling_wrapper = furthest_point_sampling_wrapper
    pn2.gather_points_wrapper = gather_points_wrapper
    pn2.group_points_wrapper = group_points_wrapper
    pn2.ball_query_wrapper = ball_query_wrapper
    pn2.three_nn_wrapper = three_nn_wrapper
    pn2.three_interpolate_wrapper = three_interpolate_wrapper
    pn2.gather_points_grad_wrapper = gather_points_grad_wrapper
    pn2.group_points_grad_wrapper = group_points_grad_wrapper
    pn2.three_interpolate_grad_wrapper = three_interpolate_grad_wrapper
    sys.modules["pointnet2_batch_cuda"] = pn2

    pops = types.ModuleType("pointops_cuda")

    def knnquery_cuda(m, nsample, xyz, new_xyz, offset, new_offset, idx,
                      dist2):
        # packed layout (n, 3) with per-batch prefix offsets
        off = [int(x) for x in offset]
        noff = [int(x) for x in new_offset]
        s0 = q0 = 0
        for s1, q1 in zip(off, noff):
            i, d2 = our_knn(jnp.asarray(_np(xyz[s0:s1]))[None],
                            jnp.asarray(_np(new_xyz[q0:q1]))[None],
                            int(nsample))
            idx[q0:q1].copy_(torch.from_numpy(
                np.asarray(i[0]).astype(np.int32) + s0))
            dist2[q0:q1].copy_(torch.from_numpy(
                np.asarray(d2[0], np.float32)))
            s0, q0 = s1, q1

    pops.knnquery_cuda = knnquery_cuda
    sys.modules["pointops_cuda"] = pops


def load_reference():
    """Import the reference openpoints package (CPU-safe).  Returns the dict
    of modules; cached after the first call."""
    if _cache:
        return _cache
    if not available:
        raise RuntimeError("reference checkout not available")
    sys.path.insert(0, REF)
    _install_stubs()
    _install_fake_extensions()
    import warnings
    warnings.filterwarnings("ignore", category=SyntaxWarning)
    import openpoints.models as ref_models  # noqa: F401
    from openpoints.models.build import MODELS as REF_MODELS
    from openpoints.utils import EasyConfig as RefConfig
    _cache.update(models=ref_models, MODELS=REF_MODELS, RefConfig=RefConfig)
    return _cache


# ---------------------------------------------------------------------------
# weight transplant: torch modules → flax params / batch_stats
# ---------------------------------------------------------------------------

def _dense_from_conv(conv):
    w = conv.weight.detach().numpy()
    w = w.reshape(w.shape[0], w.shape[1])  # (out, in)
    p = {"kernel": w.T.copy()}
    if conv.bias is not None:
        p["bias"] = conv.bias.detach().numpy().copy()
    return p


def _bn(bn):
    params = {"scale": bn.weight.detach().numpy().copy(),
              "bias": bn.bias.detach().numpy().copy()}
    stats = {"mean": bn.running_mean.detach().numpy().copy(),
             "var": bn.running_var.detach().numpy().copy()}
    return params, stats


def _convblock(seq):
    """torch create_convblock Sequential([conv, norm?, act?]) → flax ConvBlock
    subtree ({Dense_0, BatchNorm_0?} params, {BatchNorm_0?} stats)."""
    import torch
    params = {"Dense_0": _dense_from_conv(seq[0])}
    stats = {}
    for m in seq[1:]:
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            p, s = _bn(m)
            params["BatchNorm_0"] = p
            stats["BatchNorm_0"] = s
    return params, stats


def _separable_la(convblock2d):
    """Fused W·[dp; fj] Conv2d → separable {w_dp, w_f} Dense pair (dp is
    concatenated FIRST in get_aggregation_feautres, so W[:, :3] is the dp
    half)."""
    import torch
    conv = convblock2d[0]
    w = conv.weight.detach().numpy()
    w = w.reshape(w.shape[0], w.shape[1])  # (out, 3 + in)
    params = {"w_dp": {"kernel": w[:, :3].T.copy()},
              "w_f": {"kernel": w[:, 3:].T.copy()}}
    stats = {}
    for m in convblock2d[1:]:
        if isinstance(m, torch.nn.BatchNorm2d):
            p, s = _bn(m)
            params["BatchNorm_0"] = p
            stats["BatchNorm_0"] = s
    return params, stats


def encoder_tree(ref_encoder):
    """torch PointNextEncoder(.encoder Sequential of stages) → flax
    {enc{i}_sa, enc{i}_block{j}} subtrees."""
    params, stats = {}, {}
    for i, stage in enumerate(ref_encoder.encoder):
        sa = stage[0]
        name = f"enc{i}_sa"
        if sa.is_head:
            p_, s_ = _convblock(sa.convs[0])
            params[name] = {"ConvBlock_0": p_}
            if s_:
                stats[name] = {"ConvBlock_0": s_}
        else:
            params[name], stats[name] = _separable_la(sa.convs[0])
        for j in range(1, len(stage)):
            blk = stage[j]  # InvResMLP
            bp, bs = {}, {}
            bp["LocalAggregation_0"], bs["LocalAggregation_0"] = \
                _separable_la(blk.convs.convs[0])
            for k, pw in enumerate(blk.pwconv):
                cp, cs = _convblock(pw)
                bp[f"ConvBlock_{k}"] = cp
                if cs:
                    bs[f"ConvBlock_{k}"] = cs
            params[f"enc{i}_block{j}"] = bp
            stats[f"enc{i}_block{j}"] = bs
    return params, stats


def decoder_tree(ref_decoder):
    """torch PointNextDecoder(.decoder Sequential of FP stages) → flax
    {fp{k}} subtrees (same index order: k = deepest-first position in the
    reference Sequential equals our fp naming)."""
    params, stats = {}, {}
    for k in range(len(ref_decoder.decoder)):
        fp = ref_decoder.decoder[k][0]
        dp, ds = {}, {}
        for c, cb in enumerate(fp.convs):
            cp, cs = _convblock(cb)
            dp[f"ConvBlock_{c}"] = cp
            if cs:
                ds[f"ConvBlock_{c}"] = cs
        params[f"fp{k}"] = dp
        stats[f"fp{k}"] = ds
    return params, stats


def head_tree(ref_head):
    """torch SegHead(.head Sequential with Dropout interleaved) → flax SegHead
    {ConvBlock_k} subtrees."""
    import torch
    params, stats = {}, {}
    blocks = [m for m in ref_head.head if isinstance(m, torch.nn.Sequential)]
    for k, cb in enumerate(blocks):
        cp, cs = _convblock(cb)
        params[f"ConvBlock_{k}"] = cp
        if cs:
            stats[f"ConvBlock_{k}"] = cs
    return params, stats


def transplant_base_seg(ref_model):
    """Full torch BaseSeg → flax {params, batch_stats} for our BaseSeg."""
    enc_p, enc_s = encoder_tree(ref_model.encoder)
    dec_p, dec_s = decoder_tree(ref_model.decoder)
    head_p, head_s = head_tree(ref_model.head)
    params = {"encoder": enc_p, "decoder": dec_p, "head": head_p}
    stats = {"encoder": enc_s, "decoder": dec_s, "head": head_s}
    return params, stats


def apm_tree(ref_apm, n_stages, linear_mapping):
    """torch APM_pf_ConCate (layer_{s} Sequential towers with Linear/BN at
    fixed offsets, map_{s} Linear) → flax {layer_{s}: {Dense_k, BatchNorm_k},
    map_{s}} subtrees — only the stages the model actually calls."""
    import torch
    params, stats = {}, {}
    for s in range(n_stages):
        seq = getattr(ref_apm, f"layer_{s}")
        tp, ts = {}, {}
        k_lin = k_bn = 0
        for m in seq:
            if isinstance(m, torch.nn.Linear):
                tp[f"Dense_{k_lin}"] = {
                    "kernel": m.weight.detach().numpy().T.copy(),
                    "bias": m.bias.detach().numpy().copy()}
                k_lin += 1
            elif isinstance(m, torch.nn.BatchNorm1d):
                p_, s_ = _bn(m)
                tp[f"BatchNorm_{k_bn}"] = p_
                ts[f"BatchNorm_{k_bn}"] = s_
                k_bn += 1
        params[f"layer_{s}"] = tp
        stats[f"layer_{s}"] = ts
        if linear_mapping:
            mp = getattr(ref_apm, f"map_{s}")[0]
            params[f"map_{s}"] = {
                "kernel": mp.weight.detach().numpy().T.copy(),
                "bias": mp.bias.detach().numpy().copy()}
    return params, stats


def transplant_mm(ref_model, n_stages):
    """torch BaseSeg_M_AMContrast3D → flax BaseSeg_M_AMContrast3D tree."""
    params, stats = transplant_base_seg(ref_model)
    ap, asts = apm_tree(ref_model.APM, n_stages, ref_model.linear_mapping)
    params["APM"] = ap
    stats["APM"] = asts
    return params, stats


def randomize_(model, seed=0):
    """Randomize every parameter AND BN running stat so the transplant is a
    strong identity check (fresh-init BN stats are all-0/1)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.5)
