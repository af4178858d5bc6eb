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

TQ = int(os.environ.get("AMC3D_CONTRAST_TQ", "512"))    # query tile
CS = int(os.environ.get("AMC3D_CONTRAST_CS", "2048"))   # support chunk
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
# kill-switch for the bbox chunk pruning (debug / fallback)
_PRUNE = os.environ.get("AMC3D_CONTRAST_PRUNE", "1") != "0"
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


def _bbox_lb(qlo, qhi, clo, chi):
    """Lower bound on d² between any (query in tile box, support in chunk
    box): per-dim gap clamped at 0, squared, summed.  Inputs are 3-tuples
    of SCALARS (Mosaic rejects 3-lane vector reductions — 'Offset change');
    conservative margin is applied by the caller on the threshold side
    (cross-form fp32 rounding)."""
    lb = 0.0
    for d in range(3):
        gap = jnp.maximum(jnp.maximum(clo[d] - qhi[d], qlo[d] - chi[d]), 0.0)
        lb = lb + gap * gap
    return lb


def _minmax3(rows):
    """(n, 3) block → per-dim (min, max) scalar tuples via (n, 1) column
    reductions (full-array reductions to 0-d are Mosaic-safe)."""
    lo = tuple(jnp.min(rows[:, d:d + 1]) for d in range(3))
    hi = tuple(jnp.max(rows[:, d:d + 1]) for d in range(3))
    return lo, hi


def _fwd_kernel(qauxT_ref, buf_ref, out_ref, cand_ref, *, cs: int, C: int,
                k: int, g: int, tinv: float, cctype_root: bool,
                has_kth: bool, need_s: bool, need_d: bool, precision):
    """Pass 1 (unless has_kth): tournament best-2 per g-sublane group →
    k-round value extraction → thr.  Pass 2: masked reductions, (cs, tq)
    tiles, sums over sublanes → (1, tq) rows.

    Spatial pruning (exact): with Morton-sorted inputs (wrapper) the
    per-chunk bounding boxes are tight; a chunk whose box-to-box lower
    bound exceeds the tile's threshold bound cannot contribute any member
    pair, so both the selection candidates and the reduction pass skip it.
    Selection stays exact-or-superset: the phase-A bound ``ub`` (k-th
    candidate of the tile's own chunk) upper-bounds every query's true
    k-th distance, so no true-neighbor chunk is skipped."""
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]               # (1, TQ)
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    labq = qauxT_ref[0, 3:4, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1

    if prune:
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))

        def chunk_lb(c):
            pc = buf_ref[0, pl.ds(c * cs, cs), C:C + 3]      # (cs, 3)
            clo, chi = _minmax3(pc)
            return _bbox_lb(qlo, qhi, clo, chi)
    else:
        chunk_lb = lambda c: 0.0

    if has_kth:
        thr = qauxT_ref[0, 4:5, :]
    else:
        def ext_rounds(cd, rounds):
            def ext_body(j, cd):
                m = jnp.min(cd, axis=0, keepdims=True)
                return jnp.where(cd == m, _INF, cd)
            return lax.fori_loop(0, rounds, ext_body, cd)

        def chunk_topk(c):
            """This chunk's k smallest distances per query, (k, tq), via a
            best-4-per-STRIDED-group tournament + k in-register extraction
            rounds.  Hierarchical selection is exact: the global top-k is
            contained in the union of per-chunk top-ks.  Strided groups
            (group b = rows {b, b+cs/g, ...}) + capacity 4 keep overflow
            negligible even when spatial sorting concentrates a query's
            neighbors into one chunk (measured: capacity 2 overflowed for
            ~20% of queries on kd-sorted rooms; ≥5-in-one-group is
            C(24,5)/64⁴ ≈ 0.3%) — overflow and tie collapse only ever
            RAISE thr (superset direction)."""
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            d2 = _d2_tile(ch, qx, qy, qz, C)                 # (cs, tq)
            if g == 0:  # small-N: exact top-k of the full column
                cd = d2
            else:
                d3 = d2.reshape(g, cs // g, tq)
                ms = []
                for _ in range(4):
                    m = jnp.min(d3, axis=0)                  # (cs//g, tq)
                    ms.append(m)
                    d3 = jnp.where(d3 == m[None, :, :], _INF, d3)
                cd = jnp.concatenate(ms, axis=0)             # (4·cs/g, tq)
            rows = []
            for _ in range(k):
                m = jnp.min(cd, axis=0, keepdims=True)       # (1, tq)
                rows.append(m)
                cd = jnp.where(cd == m, _INF, cd)
            # pad the slab to a sublane multiple (8) so the dynamic-offset
            # stores stay tile-aligned
            for _ in range(kp - k):
                rows.append(jnp.full((1, tq), _INF, jnp.float32))
            return jnp.concatenate(rows, axis=0)             # (kp, tq), asc

        kp = -(-k // 8) * 8

        def sel_chunk(c):
            cand_ref[pl.ds(c * kp, kp), :] = chunk_topk(c)

        if not prune:
            def sel_body(c, _):
                sel_chunk(c)
                return 0
            lax.fori_loop(0, n_chunks, sel_body, 0)
        else:
            # phase A (functional — no cand_ref reads interleave with the
            # stores below; a read between dynamic-offset stores proved
            # schedule-fragile under Mosaic): the tile's own chunk yields
            # ub ≥ every query's true k-th distance (k-th over a support
            # subset only shrinks as support grows); phase B stores the
            # candidates of every chunk that could beat it
            c0 = (t * tq) // cs
            candA = chunk_topk(c0)                           # ascending
            ub = jnp.max(candA[k - 1:k, :]) * (1.0 + 1e-4)

            cand_ref[:] = jnp.full(cand_ref.shape, _INF, cand_ref.dtype)

            def sel_cond(c, _):
                @pl.when(chunk_lb(c) <= ub)
                def _():
                    sel_chunk(c)
                return 0
            lax.fori_loop(0, n_chunks, sel_cond, 0)

        cd = ext_rounds(cand_ref[:], k - 1)
        # ties collapse and group overflow only ever raise thr: the
        # threshold set is the exact k-NN set or a slight superset
        thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)  # (1, tq)

    thr_bound = jnp.max(thr) * (1.0 + 1e-4)

    fq = buf_ref[0, pl.ds(t * tq, tq), 0:C]  # (TQ, C) — sublane-dynamic
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def chunk_reduce(c, accs):
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

    def body(c, accs):
        if not prune:
            return chunk_reduce(c, accs)
        return lax.cond(chunk_lb(c) <= thr_bound,
                        lambda a: chunk_reduce(c, a), lambda a: a, accs)

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
    """df_i = Σ_j w_ij f_j — query-side gradient, (cs, tq) tiles.  Chunks
    beyond the tile's threshold bound have w ≡ 0 and are skipped (exact,
    same bboxes as the forward)."""
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
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1
    fq = buf_ref[0, pl.ds(t * tq, tq), 0:C]
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)
    thr_bound = jnp.max(thr) * (1.0 + 1e-4)
    if prune:
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))

    def chunk_grad(c, acc):
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

    def body(c, acc):
        if not prune:
            return chunk_grad(c, acc)
        pc = buf_ref[0, pl.ds(c * cs, cs), C:C + 3]
        clo, chi = _minmax3(pc)
        lb = _bbox_lb(qlo, qhi, clo, chi)
        return lax.cond(lb <= thr_bound, lambda a: chunk_grad(c, a),
                        lambda a: a, acc)

    dfq_ref[0] = lax.fori_loop(0, n_chunks, body,
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
    n_tiles = m_pad // tq
    prune = _PRUNE and n_tiles > 1
    fc = chunk_ref[0, :, 0:C]               # (cs, C)
    colg = (c * cs + lax.broadcasted_iota(jnp.int32, (1, cs), 1)).astype(
        jnp.float32)
    if prune:
        clo = (jnp.min(sx), jnp.min(sy), jnp.min(sz))
        chi = (jnp.max(sx), jnp.max(sy), jnp.max(sz))

    def tile_grad(t, acc, qb):
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

    def body(t, acc):
        qb = buf2_ref[0, pl.ds(t * tq, tq), :]           # (tq, C+9)
        if not prune:
            return tile_grad(t, acc, qb)
        qp = qb[:, C:C + 3]
        thr_bound = jnp.max(qb[:, C + 4:C + 5]) * (1.0 + 1e-4)
        qlo, qhi = _minmax3(qp)
        lb = _bbox_lb(qlo, qhi, clo, chi)
        return lax.cond(lb <= thr_bound, lambda a: tile_grad(t, a, qb),
                        lambda a: a, acc)

    dfs_ref[0] = lax.fori_loop(0, n_tiles, body,
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
    # per-chunk top-k slabs, 8-row aligned (hierarchical selection)
    cand_rows = (n_pad // cs) * (-(-max(k or 1, 1) // 8) * 8)
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
# Morton sorting (makes the in-kernel bbox pruning effective)
# ---------------------------------------------------------------------------

# The chunk-pruning bounds are exact for ANY input order; sorting merely
# tightens the per-chunk bounding boxes so pruning actually fires.  Disable
# with AMC3D_CONTRAST_SORT=0 (kernels then see the caller's order).
_SORT = os.environ.get("AMC3D_CONTRAST_SORT", "1") != "0"


def _morton_key(p: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) → (B, N) uint32 30-bit Morton code (10 bits/dim over the
    per-cloud bounding box)."""
    p = jax.lax.stop_gradient(p)
    lo = jnp.min(p, axis=1, keepdims=True)
    hi = jnp.max(p, axis=1, keepdims=True)
    x = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return ((spread(x[..., 0]) << 2) | (spread(x[..., 1]) << 1)
            | spread(x[..., 2]))


def _morton_sort(p: jnp.ndarray):
    """(B, N, 3) → (sorted p, perm (B, N) int32, inverse perm).

    The sorted POSITIONS are carried through ``lax.sort`` as sort operands
    rather than re-gathered by the permutation: an in-jit
    ``take_along_axis`` gather of ``p`` feeding the Pallas custom call
    miscompiles on the remote-TPU platform (kernel reads corrupted query
    coordinates; measured npos wrong for 75% of points), while sort-carried
    operands and feature/label gathers are sound.  Do not "simplify" this
    back to a gather."""
    key = _morton_key(p)
    B, N = key.shape
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    _, sx, sy, sz, perm = jax.lax.sort(
        (key, p[..., 0], p[..., 1], p[..., 2], idx), dimension=1, num_keys=1)
    ps = jnp.stack([sx, sy, sz], axis=-1)
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
    return ps, perm.astype(jnp.int32), inv


def _factorize(n: int):
    fs, d = [], 2
    while n > 1:
        while n % d == 0:
            fs.append(d)
            n //= d
        d += 1
    return sorted(fs, reverse=True)


def _kd_sort(p: jnp.ndarray, n_pad: int, cs: int):
    """kd-style recursive median ordering → (sorted p, perm, inv).

    Morton chunks of a 24k-point room span ~half its extent (curve jumps),
    killing bbox pruning (measured 8/12 chunks visited).  Median splits
    give each cs-sized chunk a contiguous coordinate slab — the optimal
    axis-aligned partition for a fixed chunk count (~2-3/12 visited).  Each
    level is one segmented multi-key ``lax.sort`` by (segment id, chosen
    coordinate); the split axis is the per-batch greedy argmax of the
    estimated segment extent.  Positions are sort-carried (never gathered —
    see _morton_sort)."""
    B, N, _ = p.shape
    pp = jax.lax.stop_gradient(p)
    ext = (jnp.max(pp, axis=1) - jnp.min(pp, axis=1)).astype(jnp.float32)
    idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    iota = idx
    sx, sy, sz = p[..., 0], p[..., 1], p[..., 2]
    perm = idx
    size = n_pad
    for arity in _factorize(n_pad // cs):
        seg = iota // size          # segments of the PREVIOUS level
        ax = jnp.argmax(ext, axis=1)                      # (B,)
        oh = jax.nn.one_hot(ax, 3, dtype=jnp.float32)     # (B, 3)
        coord = (jax.lax.stop_gradient(sx) * oh[:, 0:1]
                 + jax.lax.stop_gradient(sy) * oh[:, 1:2]
                 + jax.lax.stop_gradient(sz) * oh[:, 2:3])
        _, _, sx, sy, sz, perm = jax.lax.sort(
            (seg, coord, sx, sy, sz, perm), dimension=1, num_keys=2)
        ext = ext * (1.0 - oh) + (ext / arity) * oh
        size //= arity
    ps = jnp.stack([sx, sy, sz], axis=-1)
    perm = perm.astype(jnp.int32)
    inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
    return ps, perm, inv


def _spatial_sort(p: jnp.ndarray):
    """Dispatch: kd ordering sized to the kernel's chunking."""
    n_pad, cs, _ = _shapes(p.shape[1])
    return _kd_sort(p, n_pad, cs)


def _sort_enabled(n: int) -> bool:
    return _SORT and n > CS  # single-chunk shapes have nothing to prune


def _gather_n(x, perm):
    if x.ndim == 3:
        return jnp.take_along_axis(x, perm[..., None], axis=1)
    return jnp.take_along_axis(x, perm, axis=1)


# ---------------------------------------------------------------------------
# public entry points (custom VJPs)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _contrast_reductions_core(p, f, lab, kth, tinv: float = 1.0,
                              cctype_root: bool = False,
                              interpret: bool = False,
                              precision: str = None, need_s: bool = True,
                              need_d: bool = True):
    return _run_fwd(p, f, lab, kth, None, tinv, cctype_root, interpret,
                    precision, need_s, need_d)


def contrast_reductions(p, f, lab, kth, tinv: float = 1.0,
                        cctype_root: bool = False, interpret: bool = False,
                        precision: str = None, need_s: bool = True,
                        need_d: bool = True):
    """Reductions with an externally supplied threshold ``kth`` (the exact
    backend derives it from the exact kNN's neighbor set).

    p (B,N,3), f (B,N,C), lab (B,N) float32 (argmax labels), kth (B,N) d²
    threshold → (B, N, 9) [P,Q,Spos,Sneg,npos,nneg,dpos,dneg,thr].
    Differentiable in ``f`` only.  Multi-chunk shapes are Morton-sorted on
    the way in (and un-sorted on the way out) so the kernels' bbox pruning
    fires; results are permutation-invariant."""
    if _sort_enabled(p.shape[1]):
        ps, perm, inv = _spatial_sort(p)
        out = _contrast_reductions_core(
            ps, _gather_n(f, perm), _gather_n(lab, perm),
            _gather_n(kth, perm), tinv, cctype_root, interpret, precision,
            need_s, need_d)
        return _gather_n(out, inv)
    return _contrast_reductions_core(p, f, lab, kth, tinv, cctype_root,
                                     interpret, precision, need_s, need_d)


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


_contrast_reductions_core.defvjp(_cr_fwd, _cr_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _contrast_reductions_selfk_core(p, f, lab, k: int, tinv: float = 1.0,
                                    cctype_root: bool = False,
                                    interpret: bool = False,
                                    precision: str = None,
                                    need_s: bool = True, need_d: bool = True):
    return _run_fwd(p, f, lab, None, k, tinv, cctype_root, interpret,
                    precision, need_s, need_d)


def contrast_reductions_selfk(p, f, lab, k: int, tinv: float = 1.0,
                              cctype_root: bool = False,
                              interpret: bool = False, precision: str = None,
                              need_s: bool = True, need_d: bool = True):
    """Fully fused variant: the k-th-nearest threshold is computed inside
    the forward kernel (value-only tournament selection — exact-or-superset
    neighborhoods), so no separate kNN runs at all.  ``k`` counts the self
    point, matching ``knn(p, p, k)``'s self-first layout.  Multi-chunk
    shapes are Morton-sorted in/out so the bbox pruning fires."""
    if _sort_enabled(p.shape[1]):
        ps, perm, inv = _spatial_sort(p)
        out = _contrast_reductions_selfk_core(
            ps, _gather_n(f, perm), _gather_n(lab, perm),
            k, tinv, cctype_root, interpret, precision, need_s, need_d)
        return _gather_n(out, inv)
    return _contrast_reductions_selfk_core(p, f, lab, k, tinv, cctype_root,
                                           interpret, precision, need_s,
                                           need_d)


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


_contrast_reductions_selfk_core.defvjp(_crs_fwd, _crs_bwd)


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
    support's one-hot labels.  Same exact bbox chunk-pruning as _fwd_kernel;
    queries are not support points here, so phase A runs on the chunk with
    the smallest box lower bound instead of an 'own' chunk."""
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1

    if prune:
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))

        def chunk_lb(c):
            pc = buf_ref[0, pl.ds(c * cs, cs), ncls:ncls + 3]
            clo, chi = _minmax3(pc)
            return _bbox_lb(qlo, qhi, clo, chi)
    else:
        chunk_lb = lambda c: 0.0

    def ext_rounds(cd, rounds):
        def ext_body(j, cd):
            m = jnp.min(cd, axis=0, keepdims=True)
            return jnp.where(cd == m, _INF, cd)
        return lax.fori_loop(0, rounds, ext_body, cd)

    kp = -(-k // 8) * 8

    def chunk_topk(c):
        # hierarchical per-chunk top-k — see _fwd_kernel.chunk_topk
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, ncls)
        if g == 0:
            cd = d2
        else:
            d3 = d2.reshape(g, cs // g, tq)
            ms = []
            for _ in range(4):
                m = jnp.min(d3, axis=0)
                ms.append(m)
                d3 = jnp.where(d3 == m[None, :, :], _INF, d3)
            cd = jnp.concatenate(ms, axis=0)
        rows = []
        for _ in range(k):
            m = jnp.min(cd, axis=0, keepdims=True)
            rows.append(m)
            cd = jnp.where(cd == m, _INF, cd)
        for _ in range(kp - k):
            rows.append(jnp.full((1, tq), _INF, jnp.float32))
        return jnp.concatenate(rows, axis=0)

    def sel_chunk(c):
        cand_ref[pl.ds(c * kp, kp), :] = chunk_topk(c)

    if not prune:
        def sel_body(c, _):
            sel_chunk(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_body, 0)
    else:
        # phase A (functional — see _fwd_kernel): queries are not support
        # points here, so use the chunk with the smallest box lower bound
        def min_lb(c, best):
            lb = chunk_lb(c)
            best_lb, best_c = best
            take = lb < best_lb
            return (jnp.where(take, lb, best_lb),
                    jnp.where(take, c, best_c))

        _, c0 = lax.fori_loop(0, n_chunks, min_lb,
                              (jnp.float32(_INF), jnp.int32(0)))
        candA = chunk_topk(c0)                               # ascending
        ub = jnp.max(candA[k - 1:k, :]) * (1.0 + 1e-4)

        cand_ref[:] = jnp.full(cand_ref.shape, _INF, cand_ref.dtype)

        def sel_cond(c, _):
            @pl.when(chunk_lb(c) <= ub)
            def _():
                sel_chunk(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_cond, 0)

    cd = ext_rounds(cand_ref[:], k - 1)
    thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)
    thr_bound = jnp.max(thr) * (1.0 + 1e-4)

    def chunk_count(c, acc):
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, ncls)
        nbf = jnp.where(d2 <= thr, 1.0, 0.0)                 # (cs, tq)
        oh = ch[:, 0:ncls]                                   # (cs, ncls)
        # counts += nbᵀ · onehot: contract the cs (sublane) dims on the MXU
        return acc + lax.dot_general(nbf, oh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    def body(c, acc):
        if not prune:
            return chunk_count(c, acc)
        return lax.cond(chunk_lb(c) <= thr_bound,
                        lambda a: chunk_count(c, a), lambda a: a, acc)

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
    cand_rows = (n_pad // cs) * (-(-k // 8) * 8)

    q_inv = None
    if _sort_enabled(N):
        # sorted support tightens the chunk bboxes; sorted queries tighten
        # the tile boxes.  The vote counts are permutation-invariant.
        # Positions are sort-carried, not gathered (_morton_sort doc).
        p_sup, sperm, _ = _spatial_sort(p_sup)
        lab_sup = _gather_n(lab_sup, sperm)
        p_q, _, q_inv = _spatial_sort(p_q)
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
    votes = jnp.argmax(counts[:, :M], axis=-1).astype(jnp.int32)
    if q_inv is not None:
        votes = jnp.take_along_axis(votes, q_inv, axis=1)
    return votes


# ---------------------------------------------------------------------------
# fused DualMasks cross-feature kernel (MM masked refinement)
# ---------------------------------------------------------------------------
# ↔ MaskedRefine.py:49-108 CrossMask: per point, the feature of its
# minimum-ambiguity kNN neighbor ('MIN', ties averaged) or the mean over
# zero-ambiguity neighbors ('MIN_ALL0').  The XLA path needs a kNN + a
# (B, N, K) ambiguity gather (+ a (B, N, K, C) feature gather for ALL0);
# here one kernel runs the threshold selection (as _fwd_kernel), a masked
# min-reduction for the per-query minimum neighbor ambiguity, and one MXU
# matmul against a 0/1 weight tile — neighborhoods are exact-or-superset
# and argmin ties are averaged (both in DEVIATIONS.md §11; exact equality
# holds whenever the min-ambiguity member is unique).  The VJP is a single
# support-side matmul kernel: w does not depend on f at all.

def _refine_fwd_kernel(qauxT_ref, buf_ref, outf_ref, outs_ref, cand_ref, *,
                       cs: int, C: int, k: int, g: int, fusion_min: bool,
                       precision):
    t = pl.program_id(1)
    qx = qauxT_ref[0, 0:1, :]
    qy = qauxT_ref[0, 1:2, :]
    qz = qauxT_ref[0, 2:3, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1
    po = C + 1      # buf = [f | 1 | x y z | a]

    if prune:
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))

        def chunk_lb(c):
            pc = buf_ref[0, pl.ds(c * cs, cs), po:po + 3]
            clo, chi = _minmax3(pc)
            return _bbox_lb(qlo, qhi, clo, chi)
    else:
        chunk_lb = lambda c: 0.0

    kp = -(-k // 8) * 8

    def chunk_topk(c):
        # hierarchical per-chunk top-k — see _fwd_kernel.chunk_topk
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = _d2_tile(ch, qx, qy, qz, po)
        if g == 0:
            cd = d2
        else:
            d3 = d2.reshape(g, cs // g, tq)
            ms = []
            for _ in range(4):
                m = jnp.min(d3, axis=0)
                ms.append(m)
                d3 = jnp.where(d3 == m[None, :, :], _INF, d3)
            cd = jnp.concatenate(ms, axis=0)
        rows = []
        for _ in range(k):
            m = jnp.min(cd, axis=0, keepdims=True)
            rows.append(m)
            cd = jnp.where(cd == m, _INF, cd)
        for _ in range(kp - k):
            rows.append(jnp.full((1, tq), _INF, jnp.float32))
        return jnp.concatenate(rows, axis=0)

    def sel_chunk(c):
        cand_ref[pl.ds(c * kp, kp), :] = chunk_topk(c)

    if not prune:
        def sel_body(c, _):
            sel_chunk(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_body, 0)
    else:
        # phase A functional (no cand_ref read between dynamic stores —
        # see _fwd_kernel); queries ARE support rows, so the tile's own
        # chunk bounds every query's true k-th distance
        c0 = (t * tq) // cs
        candA = chunk_topk(c0)
        ub = jnp.max(candA[k - 1:k, :]) * (1.0 + 1e-4)
        cand_ref[:] = jnp.full(cand_ref.shape, _INF, cand_ref.dtype)

        def sel_cond(c, _):
            @pl.when(chunk_lb(c) <= ub)
            def _():
                sel_chunk(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_cond, 0)

    def ext_body(j, cd):
        m = jnp.min(cd, axis=0, keepdims=True)
        return jnp.where(cd == m, _INF, cd)

    cd = lax.fori_loop(0, k - 1, ext_body, cand_ref[:])
    thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)   # (1, tq)
    thr_bound = jnp.max(thr) * (1.0 + 1e-4)
    qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (1, tq), 1)).astype(
        jnp.float32)

    def members(c, ch):
        d2 = _d2_tile(ch, qx, qy, qz, po)
        colg = (c * cs + lax.broadcasted_iota(jnp.int32, (cs, tq), 0)
                ).astype(jnp.float32)
        return jnp.logical_and(d2 <= thr, colg != qidx)

    # pass 2: per-query minimum member ambiguity (MIN fusion only)
    if fusion_min:
        def chunk_min(c, mv):
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            av = ch[:, po + 3:po + 4]                        # (cs, 1)
            am = jnp.where(members(c, ch), av, _INF)
            return jnp.minimum(mv, jnp.min(am, axis=0, keepdims=True))

        def min_body(c, mv):
            if not prune:
                return chunk_min(c, mv)
            return lax.cond(chunk_lb(c) <= thr_bound,
                            lambda v: chunk_min(c, v), lambda v: v, mv)

        mv = lax.fori_loop(0, n_chunks, min_body,
                           jnp.full((1, tq), _INF, jnp.float32))
    else:
        mv = jnp.zeros((1, tq), jnp.float32)

    # pass 3: 0/1 weights -> one MXU matmul against [f | 1] (the ones
    # column yields the member count in lane C, (tq, 1)-oriented for the
    # normalization); a (1, tq)-oriented count accumulates for the VJP
    def chunk_w(c, accs):
        acc, cnt = accs
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        av = ch[:, po + 3:po + 4]
        sel = (av == mv) if fusion_min else (av <= 0.0)      # (cs, tq)
        w = jnp.where(jnp.logical_and(members(c, ch), sel), 1.0, 0.0)
        acc = acc + lax.dot_general(w, ch[:, 0:C + 1],
                                    (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)      # (tq, C+1)
        return acc, cnt + jnp.sum(w, axis=0, keepdims=True)

    def w_body(c, accs):
        if not prune:
            return chunk_w(c, accs)
        return lax.cond(chunk_lb(c) <= thr_bound,
                        lambda a: chunk_w(c, a), lambda a: a, accs)

    acc, cnt = lax.fori_loop(
        0, n_chunks, w_body,
        (jnp.zeros((tq, C + 1), jnp.float32), jnp.zeros((1, tq), jnp.float32)))
    denom = (jnp.maximum(acc[:, C:C + 1], 1.0) if fusion_min
             else jnp.full((tq, 1), float(k - 1), jnp.float32))
    outf_ref[0] = acc[:, 0:C] / denom
    outs_ref[0, 0:1, :] = thr
    outs_ref[0, 1:2, :] = mv
    outs_ref[0, 2:3, :] = cnt


def _refine_bwd_kernel(buf2_ref, sauxT_ref, dfs_ref, *, tq: int, C: int,
                       fusion_min: bool, precision):
    """df_j = Σ_i w_ij g_i / c_i — support-side only (w is f-free).  buf2 =
    [g/c | x y z | thr m] query-resident; one support chunk per grid step."""
    c = pl.program_id(1)
    m_pad = buf2_ref.shape[1]
    sx = sauxT_ref[0, 0:1, :]
    sy = sauxT_ref[0, 1:2, :]
    sz = sauxT_ref[0, 2:3, :]
    sa = sauxT_ref[0, 3:4, :]
    cs = sx.shape[1]
    n_tiles = m_pad // tq
    prune = _PRUNE and n_tiles > 1
    colg = (c * cs + lax.broadcasted_iota(jnp.int32, (1, cs), 1)).astype(
        jnp.float32)
    if prune:
        clo = (jnp.min(sx), jnp.min(sy), jnp.min(sz))
        chi = (jnp.max(sx), jnp.max(sy), jnp.max(sz))

    def tile_grad(t, acc, qb):
        qx, qy, qz = qb[:, C:C + 1], qb[:, C + 1:C + 2], qb[:, C + 2:C + 3]
        thr, mv = qb[:, C + 3:C + 4], qb[:, C + 4:C + 5]
        gq = qb[:, 0:C]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2    # (tq, cs)
        qidx = (t * tq + lax.broadcasted_iota(jnp.int32, (tq, 1), 0)).astype(
            jnp.float32)
        nb = jnp.logical_and(d2 <= thr, colg != qidx)
        sel = (sa == mv) if fusion_min else (sa <= 0.0)          # (tq, cs)
        w = jnp.where(jnp.logical_and(nb, sel), 1.0, 0.0)
        return acc + lax.dot_general(w, gq, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)        # (cs, C)

    def body(t, acc):
        qb = buf2_ref[0, pl.ds(t * tq, tq), :]
        if not prune:
            return tile_grad(t, acc, qb)
        qp = qb[:, C:C + 3]
        thr_bound = jnp.max(qb[:, C + 3:C + 4]) * (1.0 + 1e-4)
        qlo, qhi = _minmax3(qp)
        lb = _bbox_lb(qlo, qhi, clo, chi)
        return lax.cond(lb <= thr_bound, lambda a: tile_grad(t, a, qb),
                        lambda a: a, acc)

    dfs_ref[0] = lax.fori_loop(0, n_tiles, body,
                               jnp.zeros((cs, C), jnp.float32))


def _refine_run_fwd(p, f, a, k, fusion_min, interpret, precision):
    B, N, C = f.shape
    # HIGHEST by default: unlike the contrast similarity matmuls, the output
    # here IS the copied feature (0/1 weights), so bf16 inputs would round
    # every refined feature by ~0.4%; the matmul only covers unpruned chunk
    # pairs and is far off the critical path
    prec = _PRECISIONS[precision or "highest"]
    n_pad, cs, tq = _shapes(N)
    g = _group(n_pad)
    cand_rows = (n_pad // cs) * (-(-k // 8) * 8)
    ones = jnp.ones((B, N, 1), jnp.float32)
    buf = jnp.concatenate([f, ones, p, a[..., None]], axis=-1)   # C+5
    buf = _pad_to(buf, n_pad, 1, value=0.0)
    if n_pad > N:
        buf = buf.at[:, N:, C + 1:C + 4].set(1e4)
        buf = buf.at[:, N:, C + 4].set(_INF)
    qauxT = jnp.transpose(_pad_to(p, n_pad, 1, value=1e4), (0, 2, 1))

    outf, outs = pl.pallas_call(
        functools.partial(_refine_fwd_kernel, cs=cs, C=C, k=k, g=g,
                          fusion_min=fusion_min, precision=prec),
        grid=(B, n_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 5), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, n_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cand_rows, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qauxT, buf)
    scal = jnp.transpose(outs, (0, 2, 1))[:, :N]                 # (B, N, 3)
    return outf[:, :N], scal[..., 0], scal[..., 1], scal[..., 2]


def _refine_run_bwd(p, a, thr, mv, cnt, gout, k, fusion_min, interpret,
                    precision):
    B, N, C = gout.shape
    prec = _PRECISIONS[precision or "highest"]  # see _refine_run_fwd
    n_pad, cs, tq = _shapes(N)
    denom = jnp.maximum(cnt, 1.0) if fusion_min else float(k - 1)
    gq = gout / denom[..., None] if fusion_min else gout / denom
    buf2 = jnp.concatenate([gq, p, thr[..., None], mv[..., None]], axis=-1)
    buf2 = _pad_to(buf2, n_pad, 1, value=0.0)
    if n_pad > N:
        buf2 = buf2.at[:, N:, C + 3].set(-1.0)  # padded queries: no members
    sauxT = jnp.transpose(
        jnp.concatenate([_pad_to(p, n_pad, 1, value=1e4),
                         _pad_to(a[..., None], n_pad, 1, value=_INF)],
                        axis=-1), (0, 2, 1))
    cs_sup = 512 if n_pad % 512 == 0 else n_pad
    tq_sup = min(TQ, n_pad)
    dfs = pl.pallas_call(
        functools.partial(_refine_bwd_kernel, tq=tq_sup, C=C,
                          fusion_min=fusion_min, precision=prec),
        grid=(B, n_pad // cs_sup),
        in_specs=[
            pl.BlockSpec((1, n_pad, C + 5), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, cs_sup), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cs_sup, C), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(buf2, sauxT)
    return dfs[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _refine_cross_core(p, f, a, k: int, fusion_min: bool,
                       interpret: bool = False, precision: str = None):
    return _refine_run_fwd(p, f, a, k, fusion_min, interpret, precision)[0]


def _rc_fwd(p, f, a, k, fusion_min, interpret, precision):
    cross, thr, mv, cnt = _refine_run_fwd(p, f, a, k, fusion_min, interpret,
                                          precision)
    return cross, (p, a, thr, mv, cnt)


def _rc_bwd(k, fusion_min, interpret, precision, res, gout):
    p, a, thr, mv, cnt = res
    df = _refine_run_bwd(p, a, thr, mv, cnt, gout, k, fusion_min, interpret,
                         precision)
    # p and a reach the output only through the (discrete) membership and
    # argmin masks — no gradient, matching the reference's gather-of-argmin
    return (jnp.zeros_like(p), df, jnp.zeros_like(a))


_refine_cross_core.defvjp(_rc_fwd, _rc_bwd)


def dual_masks_cross(p, f, a, k: int, fusion: str, interpret: bool = False,
                     precision: str = None):
    """Fused CrossMask feature (B, N, C) for DualMasks refinement.

    p (B, N, 3), f (B, N, C) any float dtype, a (B, N) ambiguity;
    ``k`` counts the self point (kNN(p, p, k) layout, self dropped).
    Differentiable in ``f`` only.  Multi-chunk shapes are spatially sorted
    in/out (positions sort-carried — see _morton_sort)."""
    fusion_min = {"MIN": True, "MIN_ALL0": False}[fusion]
    dt = f.dtype
    f32 = f.astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    if _sort_enabled(p.shape[1]):
        ps, perm, inv = _spatial_sort(p)
        cross = _refine_cross_core(ps, _gather_n(f32, perm),
                                   _gather_n(a32, perm), k, fusion_min,
                                   interpret, precision)
        cross = _gather_n(cross, inv)
    else:
        cross = _refine_cross_core(p, f32, a32, k, fusion_min, interpret,
                                   precision)
    return cross.astype(dt)
