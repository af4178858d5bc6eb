"""Fused Pallas kernel for the adaptive-margin contrast reductions.

The XLA path of the contrast loss (loss/contrast.py) materializes a
(B, N, K, C) neighbor-feature gather in HBM (~0.5 GB/stage at flagship
shapes) and pays a scatter-add for its backward — profiled at ~95 ms/step
(VERDICT r1 item 2).  This kernel removes BOTH by re-expressing the loss's
neighbor reductions densely (↔ the reference's 2nd hot loop,
``MarginContrast.py:220-259``):

* neighborhood membership is a **distance threshold**: ``d²(i,j) ≤ kth_i``
  where ``kth_i`` is the k-th-nearest distance already produced by the kNN
  kernel — no index gathers at all;
* per (query-tile, support-chunk) it recomputes d² on the VPU and the
  feature similarities as an MXU matmul ``f_q · f_sᵀ``, then accumulates the
  eight per-point sums the loss needs:

    P    = Σ_j nb·pm·exp(s/T)      Q    = Σ_j nb·(1−pm)·exp(s/T)
    Spos = Σ_j nb·pm·s             Sneg = Σ_j nb·(1−pm)·s
    npos = Σ_j nb·pm               nneg = Σ_j nb·(1−pm)
    dpos = Σ_j nb·pm·d̃             dneg = Σ_j nb·(1−pm)·d̃

  (nb = in-neighborhood ∧ not-self, pm = same-argmax-label, d̃ = d² or √d²
  per the AEF cctype).  Everything downstream — ambiguity, margins, the
  soft-NN log-ratio — is O(B·N) XLA ops on these sums.
* the custom VJP is two more matmul kernels (no scatter): with
  w_ij = (gP·pm + gQ·(1−pm))·nb·e_ij/T + (gSpos·pm + gSneg·(1−pm))·nb,

    df_i += Σ_j w_ij f_j   (query-side,  W · F on the MXU)
    df_j += Σ_i w_ij f_i   (support-side, Wᵀ · F on the MXU)

  Outputs 4..7 (npos/nneg/dpos/dneg) are NOT differentiable — they feed the
  stop-gradient'd ambiguity only, so their cotangents are structurally zero
  and the VJP ignores them.

Layout rules (the first version was 12× slower and miscompiled): every
dynamic-start slice sits on the SUBLANE dim (features/saux stored
(N, C)/(N, 4); chunk slices are ``ref[pl.ds(c·cs, cs), :]``), per-query
scalars are fed in BOTH orientations ((B, 5, m) tiles for the tile-indexed
kernels, (B, m, 5) residents for the chunk-indexed one) so no kernel ever
transposes or lane-slices dynamically, and the chunk loop is a
``fori_loop`` so Mosaic reuses one set of tile buffers instead of
allocating every unrolled iteration at once.

Deviation note (docs/DEVIATIONS.md): with the exact kNN backend the
threshold set equals the reference's k-nearest set except for exact d² ties
at the k-th slot; with the approx backend the threshold can only *recover*
neighbors the approx top-k missed (kth_approx ≥ kth_true), occasionally
counting K+1 members.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128        # query tile
CS = 2048       # support chunk

# MXU input precision for the similarity / gradient matmuls.  TPU matmuls
# default to bf16 inputs (fp32 accumulate): for cos similarities in [-1, 1]
# that is ~0.4% per-pair error on exp(s/T) — below training noise, and the
# convergence A/B (tools/convergence_check.py) covers it empirically.  Set
# AMC3D_FUSED_PRECISION=highest for fp32-exact similarities (6 MXU passes).
# (Mosaic's dot lowering supports DEFAULT and HIGHEST only; "high" maps to
# HIGHEST rather than failing.)
_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGHEST,
               "highest": jax.lax.Precision.HIGHEST}
_ENV_PRECISION = os.environ.get("AMC3D_FUSED_PRECISION", "default")

_NOUT = 8       # P, Q, Spos, Sneg, npos, nneg, dpos, dneg
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _fwd_kernel(qauxT_ref, saux_ref, f_ref, out_ref, *, cs: int, tinv: float,
                cctype_root: bool, precision):
    """Tiles in (cs, tq) orientation; reductions over sublanes → (1, tq)."""
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]               # (1, TQ)
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    labq = qauxT_ref[0, 3:4, :]
    kth = qauxT_ref[0, 4:5, :]
    tq = qx.shape[1]
    n_pad = saux_ref.shape[1]
    fq = f_ref[0, pl.ds(t * tq, tq), :]     # (TQ, C) — sublane-dynamic
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def body(c, accs):
        accP, accQ, accSp, accSn, accNp, accNn, accDp, accDn = accs
        sa = saux_ref[0, pl.ds(c * cs, cs), :]          # (cs, 4)
        sx, sy, sz, labs = sa[:, 0:1], sa[:, 1:2], sa[:, 2:3], sa[:, 3:4]
        d2 = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2    # (cs, tq)
        fc = f_ref[0, pl.ds(c * cs, cs), :]              # (cs, C)
        # s'_ji = f_j · f_i: contract the lane (C) dims → (cs, tq)
        s = lax.dot_general(fc, fq, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
        colg = (c * cs + lax.broadcasted_iota(jnp.int32, (cs, tq), 0)
                ).astype(jnp.float32)
        nb = jnp.logical_and(d2 <= kth, colg != qidx)
        pm = labs == labq
        wpos = jnp.where(jnp.logical_and(nb, pm), 1.0, 0.0)
        wneg = jnp.where(jnp.logical_and(nb, jnp.logical_not(pm)), 1.0, 0.0)
        e = jnp.exp(s * tinv)
        dt = jnp.sqrt(jnp.abs(d2) + 1e-12) if cctype_root else d2
        return (accP + jnp.sum(wpos * e, axis=0, keepdims=True),
                accQ + jnp.sum(wneg * e, axis=0, keepdims=True),
                accSp + jnp.sum(wpos * s, axis=0, keepdims=True),
                accSn + jnp.sum(wneg * s, axis=0, keepdims=True),
                accNp + jnp.sum(wpos, axis=0, keepdims=True),
                accNn + jnp.sum(wneg, axis=0, keepdims=True),
                accDp + jnp.sum(wpos * dt, axis=0, keepdims=True),
                accDn + jnp.sum(wneg * dt, axis=0, keepdims=True))

    init = tuple(jnp.zeros((1, tq), jnp.float32) for _ in range(_NOUT))
    accs = lax.fori_loop(0, n_pad // cs, body, init)
    for r in range(_NOUT):
        out_ref[0, r:r + 1, :] = accs[r]


def _bwd_rows_kernel(qauxT_ref, gT_ref, saux_ref, f_ref, dfq_ref, *, cs: int,
                     tinv: float, precision):
    """df_i = Σ_j w_ij f_j — query-side gradient, (cs, tq) tiles."""
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    labq = qauxT_ref[0, 3:4, :]
    kth = qauxT_ref[0, 4:5, :]
    gP = gT_ref[0, 0:1, :]
    gQ = gT_ref[0, 1:2, :]
    gSp = gT_ref[0, 2:3, :]
    gSn = gT_ref[0, 3:4, :]
    tq = qx.shape[1]
    n_pad = saux_ref.shape[1]
    C = f_ref.shape[2]
    fq = f_ref[0, pl.ds(t * tq, tq), :]
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def body(c, acc):
        sa = saux_ref[0, pl.ds(c * cs, cs), :]
        sx, sy, sz, labs = sa[:, 0:1], sa[:, 1:2], sa[:, 2:3], sa[:, 3:4]
        d2 = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2
        fc = f_ref[0, pl.ds(c * cs, cs), :]
        s = lax.dot_general(fc, fq, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # (cs, tq)
        colg = (c * cs + lax.broadcasted_iota(jnp.int32, (cs, tq), 0)
                ).astype(jnp.float32)
        nb = jnp.logical_and(d2 <= kth, colg != qidx)
        pm = labs == labq
        nbf = jnp.where(nb, 1.0, 0.0)
        pmf = jnp.where(pm, 1.0, 0.0)
        e = jnp.exp(s * tinv)
        w = nbf * (pmf * (gP * e * tinv + gSp) +
                   (1.0 - pmf) * (gQ * e * tinv + gSn))          # (cs, tq)
        # df_rows += w'ᵀ · F_chunk: contract the cs (sublane) dims
        return acc + lax.dot_general(w, fc, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    dfq_ref[0] = lax.fori_loop(0, n_pad // cs, body,
                               jnp.zeros((tq, C), jnp.float32))


def _bwd_sup_kernel(qaux_ref, g_ref, sauxT_ref, fc_ref, f_ref, dfs_ref, *,
                    tq: int, tinv: float, precision):
    """df_j = Σ_i w_ij f_i — support-side gradient.  Grid step = one support
    chunk ((tq, cs) tiles); the query loop runs inside so the (cs, C) output
    block accumulates in VMEM (no scatter, no cross-step revisits)."""
    c = pl.program_id(1)
    m_pad = qaux_ref.shape[1]
    C = f_ref.shape[2]
    sx = sauxT_ref[0, 0:1, :]               # (1, cs)
    sy = sauxT_ref[0, 1:2, :]
    sz = sauxT_ref[0, 2:3, :]
    labs = sauxT_ref[0, 3:4, :]
    cs = sx.shape[1]
    fc = fc_ref[0]                          # (cs, C)
    colg = (c * cs + lax.broadcasted_iota(jnp.int32, (1, cs), 1)).astype(
        jnp.float32)

    def body(t, acc):
        qa = qaux_ref[0, pl.ds(t * tq, tq), :]           # (tq, 5)
        qx, qy, qz = qa[:, 0:1], qa[:, 1:2], qa[:, 2:3]
        labq, kth = qa[:, 3:4], qa[:, 4:5]
        g = g_ref[0, pl.ds(t * tq, tq), :]               # (tq, 4)
        gP, gQ, gSp, gSn = g[:, 0:1], g[:, 1:2], g[:, 2:3], g[:, 3:4]
        fq = f_ref[0, pl.ds(t * tq, tq), :]              # (tq, C)
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2    # (tq, cs)
        s = lax.dot_general(fq, fc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # (tq, cs)
        qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(
            jnp.float32)
        nb = jnp.logical_and(d2 <= kth, colg != qidx)
        pm = labs == labq
        nbf = jnp.where(nb, 1.0, 0.0)
        pmf = jnp.where(pm, 1.0, 0.0)
        e = jnp.exp(s * tinv)
        w = nbf * (pmf * (gP * e * tinv + gSp) +
                   (1.0 - pmf) * (gQ * e * tinv + gSn))          # (tq, cs)
        # df_chunk += wᵀ · f_q: contract the tq (sublane) dims
        return acc + lax.dot_general(w, fq, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    dfs_ref[0] = lax.fori_loop(0, m_pad // tq, body,
                               jnp.zeros((cs, C), jnp.float32))


def _pad_to(x, n, axis, value=0.0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    cfg = [(0, 0)] * x.ndim
    cfg[axis] = (0, pad)
    return jnp.pad(x, cfg, constant_values=value)


def _shapes(N: int):
    if N > CS:
        n_pad = -(-N // CS) * CS
        cs = CS
    else:
        n_pad = -(-N // TQ) * TQ
        cs = n_pad
    return n_pad, cs, min(TQ, n_pad)


def _prep(p, f, lab, kth):
    """Pack the kernel operands; one padding granularity for query==support."""
    B, N, C = f.shape
    n_pad, cs, tq = _shapes(N)
    # query-side aux: x y z lab kth; padded kth=-1 kills all memberships
    qaux = jnp.concatenate(
        [p, lab.astype(jnp.float32)[..., None], kth[..., None]], axis=-1)
    qaux = _pad_to(qaux, n_pad, 1)
    if n_pad > N:
        qaux = qaux.at[:, N:, 4].set(-1.0)
    # support-side aux: x y z lab; padded positions far away
    saux = jnp.concatenate([p, lab.astype(jnp.float32)[..., None]], axis=-1)
    saux = _pad_to(saux, n_pad, 1, value=1e4)
    fpad = _pad_to(f, n_pad, 1)                               # (B, n_pad, C)
    return qaux, saux, fpad, n_pad, cs, tq


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def contrast_reductions(p, f, lab, kth, tinv: float = 1.0,
                        cctype_root: bool = False, interpret: bool = False,
                        precision: str = None):
    """p (B,N,3), f (B,N,C), lab (B,N) float32 (argmax labels), kth (B,N) d²
    threshold → (B, N, 8) stacked reductions [P,Q,Spos,Sneg,npos,nneg,dpos,dneg].

    Differentiable in ``f`` only (p/lab/kth are geometry/targets; pass them
    as float arrays)."""
    return _reductions_fwd_impl(p, f, lab, kth, tinv, cctype_root, interpret,
                                precision)


def _reductions_fwd_impl(p, f, lab, kth, tinv, cctype_root, interpret,
                         precision=None):
    prec = _PRECISIONS[precision or _ENV_PRECISION]
    B, N, C = f.shape
    qaux, saux, fpad, n_pad, cs, tq = _prep(p, f, lab, kth)
    kern = functools.partial(_fwd_kernel, cs=cs, tinv=tinv,
                             cctype_root=cctype_root, precision=prec)
    out = pl.pallas_call(
        kern,
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 5, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NOUT, tq), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _NOUT, n_pad), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(jnp.transpose(qaux, (0, 2, 1)), saux, fpad)
    return jnp.transpose(out, (0, 2, 1))[:, :N]


def _reductions_fwd(p, f, lab, kth, tinv, cctype_root, interpret, precision):
    out = _reductions_fwd_impl(p, f, lab, kth, tinv, cctype_root, interpret,
                               precision)
    return out, (p, f, lab, kth)


def _reductions_bwd(tinv, cctype_root, interpret, precision, res, gout):
    p, f, lab, kth = res
    prec = _PRECISIONS[precision or _ENV_PRECISION]
    B, N, C = f.shape
    qaux, saux, fpad, n_pad, cs, tq = _prep(p, f, lab, kth)
    g = _pad_to(gout[..., :4], n_pad, 1)                      # (B, n_pad, 4)
    qauxT = jnp.transpose(qaux, (0, 2, 1))                    # (B, 5, n_pad)
    gT = jnp.transpose(g, (0, 2, 1))                          # (B, 4, n_pad)

    rows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, cs=cs, tinv=tinv,
                          precision=prec),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 5, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(qauxT, gT, saux, fpad)

    cs_sup = 512 if n_pad % 512 == 0 else n_pad
    sup = pl.pallas_call(
        functools.partial(_bwd_sup_kernel, tq=tq, tinv=tinv,
                          precision=prec),
        grid=(B, n_pad // cs_sup),
        in_specs=[
            pl.BlockSpec((1, n_pad, 5), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, 4), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cs_sup), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs_sup, C), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cs_sup, C), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(qaux, g, jnp.transpose(saux, (0, 2, 1)), fpad, fpad)

    df = (rows + sup)[:, :N]
    return (jnp.zeros_like(p), df, jnp.zeros_like(lab, jnp.float32),
            jnp.zeros_like(kth))


contrast_reductions.defvjp(_reductions_fwd, _reductions_bwd)
