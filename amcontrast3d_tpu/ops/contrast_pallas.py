"""Fused Pallas kernels for the adaptive-margin contrast reductions.

The XLA path of the contrast loss (loss/contrast.py) needs an exact kNN per
stage (~70 ms at flagship stage-0), a (B, N, K, C) neighbor-feature gather
(~0.5 GB of HBM) and a scatter-add backward — together the step's largest
component (VERDICT r1 item 2).  These kernels remove all three by
re-expressing the loss densely (↔ the reference's 2nd hot loop,
``MarginContrast.py:220-259``):

* pass 1 (selection): per query tile, a support-on-sublanes tournament
  keeps the best-2 distances of every G-sublane group, then k value-only
  extraction rounds over the candidates yield the k-th-nearest distance
  ``thr`` — no indices, no sort, no permutation.  Because extraction
  collapses ties and group overflow only ever *raises* thr, the threshold
  neighborhood ``d² ≤ thr`` is the exact k-NN set or a slight superset
  (recall 100%), unlike index-based approx top-k;
* pass 2 (reductions): per (query-tile, support-chunk), d² on the VPU and
  similarities as one MXU matmul, accumulating the per-point sums

    P    = Σ_j nb·pm·exp(s/T)      Q    = Σ_j nb·(1−pm)·exp(s/T)
    Spos = Σ_j nb·pm·s             Sneg = Σ_j nb·(1−pm)·s
    npos = Σ_j nb·pm               nneg = Σ_j nb·(1−pm)
    dpos = Σ_j nb·pm·d̃             dneg = Σ_j nb·(1−pm)·d̃

  (nb = d²≤thr ∧ not-self, pm = same-argmax-label, d̃ = d²/√d² per the AEF
  cctype; the s/d̃ sums are skipped unless the margin/cctype needs them).
  Ambiguity, margins and the soft-NN log-ratio are then O(B·N) XLA ops.
* the custom VJP is two more matmul kernels (no scatter): with
  w_ij = (gP·pm + gQ·(1−pm))·nb·e_ij/T + (gSpos·pm + gSneg·(1−pm))·nb,

    df_i += Σ_j w_ij f_j   (query-side,  W · F on the MXU)
    df_j += Σ_i w_ij f_i   (support-side, Wᵀ · F on the MXU)

  Outputs 4..7 (npos/nneg/dpos/dneg) are NOT differentiable — they feed the
  stop-gradient'd ambiguity only.

Layout rules (hard-won): a float32 VMEM array physically occupies
lane-padded (8, 128) tiles, so a (N, 4) aux array costs as much as (N, 128)
— all per-point support data therefore piggybacks on the feature buffer as
extra TRAILING COLUMNS (``buf = [f | x y z lab (kth g…)]``), sliced with
static lane offsets; every dynamic-start slice sits on the sublane dim;
per-query scalars that must be (1, tq)-oriented ride a separate (B, rows, m)
array whose lane dim is large; chunk loops are ``fori_loop`` so Mosaic
reuses one set of tile buffers.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 512        # query tile
CS = 2048       # support chunk
_INF = 3e38

# MXU input precision for the similarity / gradient matmuls.  TPU matmuls
# default to bf16 inputs (fp32 accumulate): for cos similarities in [-1, 1]
# that is ~0.4% per-pair error on exp(s/T) — below training noise, and the
# convergence A/B (tools/convergence_check.py --ab) covers it empirically.
# AMC3D_FUSED_PRECISION=highest restores fp32-exact similarities (6 passes).
# (Mosaic's dot lowering supports DEFAULT and HIGHEST only.)
_PRECISIONS = {"default": jax.lax.Precision.DEFAULT,
               "high": jax.lax.Precision.HIGHEST,
               "highest": jax.lax.Precision.HIGHEST}
_ENV_PRECISION = os.environ.get("AMC3D_FUSED_PRECISION", "default")

_NOUT = 9       # P, Q, Spos, Sneg, npos, nneg, dpos, dneg, thr
_VMEM_LIMIT = 100 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _group(n_pad: int) -> int:
    """Sublane-group size for the best-2 tournament.  Sized so ~768 groups
    exist: with k=24 candidates spread over 768 groups the chance a group
    holds >2 true neighbors (which only *enlarges* the threshold set) is
    ~0.3% per query.  n_pad ≤ 4096 skips grouping entirely (the full
    distance column fits in scratch → exact extraction)."""
    if n_pad <= 4096:
        return 0
    for g in (64, 32, 16, 8):
        if n_pad // g >= 768:
            return g
    return 8


def _d2_tile(buf_chunk, qx, qy, qz, C):
    sx = buf_chunk[:, C:C + 1]
    sy = buf_chunk[:, C + 1:C + 2]
    sz = buf_chunk[:, C + 2:C + 3]
    return (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2


def _fwd_kernel(qauxT_ref, buf_ref, out_ref, cand_ref, *, cs: int, C: int,
                k: int, g: int, tinv: float, cctype_root: bool,
                has_kth: bool, need_s: bool, need_d: bool, precision):
    """Pass 1 (unless has_kth): tournament best-2 per g-sublane group →
    k-round value extraction → thr.  Pass 2: masked reductions, (cs, tq)
    tiles, sums over sublanes → (1, tq) rows."""
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]               # (1, TQ)
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    labq = qauxT_ref[0, 3:4, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs

    if has_kth:
        thr = qauxT_ref[0, 4:5, :]
    else:
        def sel_body(c, _):
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            d2 = _d2_tile(ch, qx, qy, qz, C)                 # (cs, tq)
            if g == 0:  # small-N: keep the whole distance column (exact)
                cand_ref[pl.ds(c * cs, cs), :] = d2
            else:
                d3 = d2.reshape(cs // g, g, tq)
                m1 = jnp.min(d3, axis=1)                     # (cs//g, tq)
                m2 = jnp.min(jnp.where(d3 == m1[:, None, :], _INF, d3),
                             axis=1)
                cand_ref[pl.ds(c * (cs // g), cs // g), :] = m1
                cand_ref[pl.ds(n_pad // g + c * (cs // g), cs // g), :] = m2
            return 0

        lax.fori_loop(0, n_chunks, sel_body, 0)

        def ext_body(j, cd):
            m = jnp.min(cd, axis=0, keepdims=True)
            return jnp.where(cd == m, _INF, cd)

        cd = lax.fori_loop(0, k - 1, ext_body, cand_ref[:])
        # ties collapse and group overflow only ever raise thr: the
        # threshold set is the exact k-NN set or a slight superset
        thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)  # (1, tq)

    fq = buf_ref[0, pl.ds(t * tq, tq), 0:C]  # (TQ, C) — sublane-dynamic
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def body(c, accs):
        accP, accQ, accSp, accSn, accNp, accNn, accDp, accDn = accs
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, C)
        labs = ch[:, C + 3:C + 4]
        fc = ch[:, 0:C]
        # s'_ji = f_j · f_i: contract the lane (C) dims → (cs, tq)
        s = lax.dot_general(fc, fq, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)
        colg = (c * cs + lax.broadcasted_iota(jnp.int32, (cs, tq), 0)
                ).astype(jnp.float32)
        nb = jnp.logical_and(d2 <= thr, colg != qidx)
        pos = jnp.logical_and(nb, labs == labq)
        # mask s before exp: padded-row dot products could overflow exp
        e = jnp.where(nb, jnp.exp(jnp.where(nb, s, 0.0) * tinv), 0.0)
        pe = jnp.where(pos, e, 0.0)
        accP = accP + jnp.sum(pe, axis=0, keepdims=True)
        accQ = accQ + jnp.sum(e - pe, axis=0, keepdims=True)
        n1 = jnp.where(nb, 1.0, 0.0)
        p1 = jnp.where(pos, 1.0, 0.0)
        accNp = accNp + jnp.sum(p1, axis=0, keepdims=True)
        accNn = accNn + jnp.sum(n1 - p1, axis=0, keepdims=True)
        if need_s:
            ms = jnp.where(nb, s, 0.0)
            ps = jnp.where(pos, s, 0.0)
            accSp = accSp + jnp.sum(ps, axis=0, keepdims=True)
            accSn = accSn + jnp.sum(ms - ps, axis=0, keepdims=True)
        if need_d:
            dt = jnp.sqrt(jnp.abs(d2) + 1e-12) if cctype_root else d2
            md = jnp.where(nb, dt, 0.0)
            pd = jnp.where(pos, dt, 0.0)
            accDp = accDp + jnp.sum(pd, axis=0, keepdims=True)
            accDn = accDn + jnp.sum(md - pd, axis=0, keepdims=True)
        return (accP, accQ, accSp, accSn, accNp, accNn, accDp, accDn)

    init = tuple(jnp.zeros((1, tq), jnp.float32) for _ in range(8))
    accs = lax.fori_loop(0, n_chunks, body, init)
    for r in range(8):
        out_ref[0, r:r + 1, :] = accs[r]
    out_ref[0, 8:9, :] = thr


def _w_tile(d2, s, labs, labq, thr, colg, qidx, g4, tinv, need_s):
    gP, gQ, gSp, gSn = g4
    nb = jnp.logical_and(d2 <= thr, colg != qidx)
    pm = labs == labq
    nbf = jnp.where(nb, 1.0, 0.0)
    pmf = jnp.where(pm, 1.0, 0.0)
    # mask s before exp: an inf from padded rows would NaN through nbf·0
    e = jnp.exp(jnp.where(nb, s, 0.0) * tinv)
    w = pmf * (gP * e * tinv) + (1.0 - pmf) * (gQ * e * tinv)
    if need_s:
        w = w + pmf * gSp + (1.0 - pmf) * gSn
    return nbf * w


def _bwd_rows_kernel(qauxT_ref, gT_ref, buf_ref, dfq_ref, *, cs: int, C: int,
                     tinv: float, need_s: bool, precision):
    """df_i = Σ_j w_ij f_j — query-side gradient, (cs, tq) tiles."""
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    labq = qauxT_ref[0, 3:4, :]
    thr = qauxT_ref[0, 4:5, :]
    g4 = (gT_ref[0, 0:1, :], gT_ref[0, 1:2, :],
          gT_ref[0, 2:3, :], gT_ref[0, 3:4, :])
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    fq = buf_ref[0, pl.ds(t * tq, tq), 0:C]
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def body(c, acc):
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, C)
        labs = ch[:, C + 3:C + 4]
        fc = ch[:, 0:C]
        s = lax.dot_general(fc, fq, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # (cs, tq)
        colg = (c * cs + lax.broadcasted_iota(jnp.int32, (cs, tq), 0)
                ).astype(jnp.float32)
        w = _w_tile(d2, s, labs, labq, thr, colg, qidx, g4, tinv, need_s)
        # df_rows += wᵀ · F_chunk: contract the cs (sublane) dims
        return acc + lax.dot_general(w, fc, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    dfq_ref[0] = lax.fori_loop(0, n_pad // cs, body,
                               jnp.zeros((tq, C), jnp.float32))


def _bwd_sup_kernel(buf2_ref, sauxT_ref, chunk_ref, dfs_ref, *, tq: int,
                    C: int, tinv: float, need_s: bool, precision):
    """df_j = Σ_i w_ij f_i — support-side gradient.  Grid step = one support
    chunk ((tq, cs) tiles); the query loop runs inside so the (cs, C) output
    block accumulates in VMEM (no scatter, no cross-step revisits).

    buf2 = [f | x y z lab thr | gP gQ gSp gSn] resident; the per-chunk
    support scalars come in (1, cs) orientation via sauxT chunk blocks."""
    c = pl.program_id(1)
    m_pad = buf2_ref.shape[1]
    sx = sauxT_ref[0, 0:1, :]               # (1, cs)
    sy = sauxT_ref[0, 1:2, :]
    sz = sauxT_ref[0, 2:3, :]
    labs = sauxT_ref[0, 3:4, :]
    cs = sx.shape[1]
    fc = chunk_ref[0, :, 0:C]               # (cs, C)
    colg = (c * cs + lax.broadcasted_iota(jnp.int32, (1, cs), 1)).astype(
        jnp.float32)

    def body(t, acc):
        qb = buf2_ref[0, pl.ds(t * tq, tq), :]           # (tq, C+9)
        qx, qy, qz = qb[:, C:C + 1], qb[:, C + 1:C + 2], qb[:, C + 2:C + 3]
        labq, thr = qb[:, C + 3:C + 4], qb[:, C + 4:C + 5]
        g4 = (qb[:, C + 5:C + 6], qb[:, C + 6:C + 7],
              qb[:, C + 7:C + 8], qb[:, C + 8:C + 9])
        fq = qb[:, 0:C]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2    # (tq, cs)
        s = lax.dot_general(fq, fc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision)  # (tq, cs)
        qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(
            jnp.float32)
        w = _w_tile(d2, s, labs, labq, thr, colg, qidx, g4, tinv, need_s)
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
    """buf = [f | x y z lab]; padded support rows pushed far (never members);
    qauxT carries the (1, tq)-oriented query scalars [x y z lab kth]."""
    B, N, C = f.shape
    n_pad, cs, tq = _shapes(N)
    labf = lab.astype(jnp.float32)[..., None]
    buf = jnp.concatenate([f, p, labf], axis=-1)
    # pad support rows: positions far (never members), features zero (keeps
    # the similarity matmul finite)
    buf = _pad_to(buf, n_pad, 1, value=0.0)
    if n_pad > N:
        buf = buf.at[:, N:, C:C + 3].set(1e4)
    if kth is None:
        kth = jnp.zeros((B, N), jnp.float32)
    qaux = jnp.concatenate([p, labf, kth[..., None]], axis=-1)
    qaux = _pad_to(qaux, n_pad, 1)
    if n_pad > N:
        qaux = qaux.at[:, N:, 4].set(-1.0)  # padded queries: no members
    return buf, jnp.transpose(qaux, (0, 2, 1)), n_pad, cs, tq


def _run_fwd(p, f, lab, kth, k, tinv, cctype_root, interpret, precision,
             need_s, need_d):
    B, N, C = f.shape
    prec = _PRECISIONS[precision or _ENV_PRECISION]
    buf, qauxT, n_pad, cs, tq = _prep(p, f, lab, kth)
    g = _group(n_pad)
    cand_rows = n_pad if g == 0 else 2 * n_pad // g
    kern = functools.partial(
        _fwd_kernel, cs=cs, C=C, k=(k or 1), g=g, tinv=tinv,
        cctype_root=cctype_root, has_kth=kth is not None,
        need_s=need_s, need_d=need_d, precision=prec)
    out = pl.pallas_call(
        kern,
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 5, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _NOUT, tq), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _NOUT, n_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cand_rows, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qauxT, buf)
    return jnp.transpose(out, (0, 2, 1))[:, :N]


def _run_bwd(p, f, lab, thr, gout, tinv, interpret, precision, need_s):
    B, N, C = f.shape
    prec = _PRECISIONS[precision or _ENV_PRECISION]
    buf, qauxT, n_pad, cs, tq = _prep(p, f, lab, thr)
    g = _pad_to(gout[..., :4], n_pad, 1)                      # (B, n_pad, 4)
    gT = jnp.transpose(g, (0, 2, 1))                          # (B, 4, n_pad)

    rows = pl.pallas_call(
        functools.partial(_bwd_rows_kernel, cs=cs, C=C, tinv=tinv,
                          need_s=need_s, precision=prec),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 5, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(qauxT, gT, buf)

    # buf2 = [f | x y z lab thr | g(4)]
    labf = lab.astype(jnp.float32)[..., None]
    buf2 = jnp.concatenate([f, p, labf, thr[..., None], gout[..., :4]],
                           axis=-1)
    buf2 = _pad_to(buf2, n_pad, 1, value=0.0)
    if n_pad > N:
        buf2 = buf2.at[:, N:, C + 4].set(-1.0)  # padded queries: no members
    sauxT = jnp.transpose(
        _pad_to(jnp.concatenate([p, labf], axis=-1), n_pad, 1, value=1e4),
        (0, 2, 1))
    cs_sup = 512 if n_pad % 512 == 0 else n_pad
    tq_sup = min(TQ, n_pad)
    sup = pl.pallas_call(
        functools.partial(_bwd_sup_kernel, tq=tq_sup, C=C, tinv=tinv,
                          need_s=need_s, precision=prec),
        grid=(B, n_pad // cs_sup),
        in_specs=[
            pl.BlockSpec((1, n_pad, C + 9), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cs_sup), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cs_sup, C + 9), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cs_sup, C), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(buf2, sauxT, buf2)

    return (rows + sup)[:, :N]


# ---------------------------------------------------------------------------
# public entry points (custom VJPs)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def contrast_reductions(p, f, lab, kth, tinv: float = 1.0,
                        cctype_root: bool = False, interpret: bool = False,
                        precision: str = None, need_s: bool = True,
                        need_d: bool = True):
    """Reductions with an externally supplied threshold ``kth`` (the exact
    backend derives it from the exact kNN's neighbor set).

    p (B,N,3), f (B,N,C), lab (B,N) float32 (argmax labels), kth (B,N) d²
    threshold → (B, N, 9) [P,Q,Spos,Sneg,npos,nneg,dpos,dneg,thr].
    Differentiable in ``f`` only."""
    return _run_fwd(p, f, lab, kth, None, tinv, cctype_root, interpret,
                    precision, need_s, need_d)


def _cr_fwd(p, f, lab, kth, tinv, cctype_root, interpret, precision, need_s,
            need_d):
    out = _run_fwd(p, f, lab, kth, None, tinv, cctype_root, interpret,
                   precision, need_s, need_d)
    return out, (p, f, lab, kth)


def _cr_bwd(tinv, cctype_root, interpret, precision, need_s, need_d, res,
            gout):
    p, f, lab, kth = res
    df = _run_bwd(p, f, lab, kth, gout, tinv, interpret, precision, need_s)
    return (jnp.zeros_like(p), df, jnp.zeros_like(lab, jnp.float32),
            jnp.zeros_like(kth))


contrast_reductions.defvjp(_cr_fwd, _cr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def contrast_reductions_selfk(p, f, lab, k: int, tinv: float = 1.0,
                              cctype_root: bool = False,
                              interpret: bool = False, precision: str = None,
                              need_s: bool = True, need_d: bool = True):
    """Fully fused variant: the k-th-nearest threshold is computed inside
    the forward kernel (value-only tournament selection — exact-or-superset
    neighborhoods), so no separate kNN runs at all.  ``k`` counts the self
    point, matching ``knn(p, p, k)``'s self-first layout."""
    return _run_fwd(p, f, lab, None, k, tinv, cctype_root, interpret,
                    precision, need_s, need_d)


def _crs_fwd(p, f, lab, k, tinv, cctype_root, interpret, precision, need_s,
             need_d):
    out = _run_fwd(p, f, lab, None, k, tinv, cctype_root, interpret,
                   precision, need_s, need_d)
    # backward re-derives membership from the forward's own threshold
    return out, (p, f, lab, out[..., 8])


def _crs_bwd(k, tinv, cctype_root, interpret, precision, need_s, need_d,
             res, gout):
    p, f, lab, thr = res
    df = _run_bwd(p, f, lab, thr, gout, tinv, interpret, precision, need_s)
    return (jnp.zeros_like(p), df, jnp.zeros_like(lab, jnp.float32))


contrast_reductions_selfk.defvjp(_crs_fwd, _crs_bwd)


# ---------------------------------------------------------------------------
# subscene label vote (AEF label propagation without kNN/gather)
# ---------------------------------------------------------------------------

def _vote_kernel(qT_ref, buf_ref, out_ref, cand_ref, *, cs: int, ncls: int,
                 k: int, g: int, precision):
    """Per stage point, class-vote counts over its kr nearest stage-0 points
    (↔ get_subscene_label_CBL, AEF/utils.py:22-43 — the loss consumes only
    the argmax of the propagated soft label, and argmax-of-mean-one-hot ==
    majority vote).  Selection pass as in _fwd_kernel (self IS a support
    point here, so no self-exclusion); counts via one MXU matmul against the
    support's one-hot labels."""
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs

    def sel_body(c, _):
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, ncls)
        if g == 0:
            cand_ref[pl.ds(c * cs, cs), :] = d2
        else:
            d3 = d2.reshape(cs // g, g, tq)
            m1 = jnp.min(d3, axis=1)
            m2 = jnp.min(jnp.where(d3 == m1[:, None, :], _INF, d3), axis=1)
            cand_ref[pl.ds(c * (cs // g), cs // g), :] = m1
            cand_ref[pl.ds(n_pad // g + c * (cs // g), cs // g), :] = m2
        return 0

    lax.fori_loop(0, n_chunks, sel_body, 0)

    def ext_body(j, cd):
        m = jnp.min(cd, axis=0, keepdims=True)
        return jnp.where(cd == m, _INF, cd)

    cd = lax.fori_loop(0, k - 1, ext_body, cand_ref[:])
    thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)

    def body(c, acc):
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, ncls)
        nbf = jnp.where(d2 <= thr, 1.0, 0.0)                 # (cs, tq)
        oh = ch[:, 0:ncls]                                   # (cs, ncls)
        # counts += nbᵀ · onehot: contract the cs (sublane) dims on the MXU
        return acc + lax.dot_general(nbf, oh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    out_ref[0] = lax.fori_loop(0, n_chunks, body,
                               jnp.zeros((tq, ncls), jnp.float32))


def label_vote(p_sup, lab_sup, p_q, k: int, num_classes: int,
               interpret: bool = False):
    """Majority-vote class of the k nearest support points for each query
    (threshold semantics — exact-or-superset vote sets).

    p_sup (B, N, 3), lab_sup (B, N) float/int class ids, p_q (B, M, 3) →
    (B, M) int32 argmax class (ties → lowest class id, like argmax of the
    reference's mean-one-hot soft label)."""
    B, N, _ = p_sup.shape
    M = p_q.shape[1]
    ncls = num_classes
    n_pad, cs, tq = _shapes(N)
    m_pad = -(-M // tq) * tq
    g = _group(n_pad)
    cand_rows = n_pad if g == 0 else 2 * n_pad // g

    oh = jax.nn.one_hot(lab_sup.astype(jnp.int32), ncls, dtype=jnp.float32)
    buf = jnp.concatenate([oh, p_sup], axis=-1)
    buf = _pad_to(buf, n_pad, 1, value=0.0)
    if n_pad > N:
        buf = buf.at[:, N:, ncls:ncls + 3].set(1e4)
    qT = jnp.transpose(_pad_to(p_q, m_pad, 1, value=-1e4), (0, 2, 1))

    counts = pl.pallas_call(
        functools.partial(_vote_kernel, cs=cs, ncls=ncls, k=k, g=g,
                          precision=_PRECISIONS[_ENV_PRECISION]),
        grid=(B, m_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, ncls + 3), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, ncls), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, ncls), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cand_rows, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qT, buf)
    return jnp.argmax(counts[:, :M], axis=-1).astype(jnp.int32)
