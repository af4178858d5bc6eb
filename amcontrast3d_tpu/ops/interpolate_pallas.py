"""Fused Pallas 3-NN inverse-distance interpolation (decoder upsampling).

↔ ``three_nn`` / ``three_interpolate`` (``models/layers/upsampling.py:11-103``
and the CUDA kernels ``interpolate_gpu.cu``).  The XLA path runs a kNN(3)
per FP stage, gathers (B, N1, 3, C) neighbor features and scatter-adds in
backward; here one forward kernel finds each fine point's 3rd-nearest
coarse distance and computes

    up_q = Σ_j nb_qj · w_qj · f_j / Σ_j nb_qj · w_qj ,  w = 1/(√d² + 1e-8)

densely — the weighted sums ride ONE MXU matmul per tile by appending a
constant-1 column to the coarse features (its output column IS the weight
sum).  The VJP w.r.t. the coarse features is a single support-side matmul
kernel (positions carry no gradient in the decoder).

Spatial pruning (exact, same machinery as ops/contrast_pallas.py): the
support is kd-sorted into cs-sized coordinate slabs and the queries
Morton-sorted so each tile is spatially local; selection takes each chunk's
exact top-3 slab (3 in-register extraction rounds — no tournament, so thr
stays exact) and skips chunks whose box-to-box lower bound exceeds the
phase-A upper bound (the tile's proportionally-positioned own chunk);
the accumulation pass and the backward kernel skip chunks/tiles beyond the
threshold bound the same way.  A d² tie still admits a 4th neighbor whose
weight equals the tied 3rd — averaging over ties instead of picking one.

Large supports beyond VMEM residency (only whole-room eval) use the
grid-chunked path: a seed/scan kernel pair finds each query's 3rd-NN d²
over the kd-sorted chunks with bbox skipping (running top-3 in scratch
across the minor chunk sweep), then the chunked accumulation applies the
same skip.  Query tiles are _BIG_TQ wide there — chunk blocks are
re-fetched per (tile, chunk) step, so tile width divides total DMA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .contrast_pallas import (_INF, _PRUNE, _bbox_lb, _gather_n, _kd_sort,
                              _minmax3, _morton_sort, _pad_to, _params)

TQ = 256
CS = 512
# fp32 matmuls throughout: the inverse-distance weights span a huge dynamic
# range and bf16 inputs cost ~0.4% on 20% of interpolated features (measured
# on device); the extra passes are ~4 ms/step at flagship shapes
_PREC = jax.lax.Precision.HIGHEST
_KP = 8  # top-3 slab rows padded to a sublane multiple


def _shapes_sup(N2: int):
    if N2 > CS:
        n_pad = -(-N2 // CS) * CS
        cs = CS
    else:
        n_pad = -(-N2 // 256) * 256
        cs = n_pad
    return n_pad, cs


def _interp_kernel(qT_ref, buf_ref, out_ref, aux_ref, cand_ref, *, cs: int,
                   C: int, precision):
    t = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    tq = qx.shape[1]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1

    def d2_of(ch):
        sx = ch[:, C + 1:C + 2]
        sy = ch[:, C + 2:C + 3]
        sz = ch[:, C + 3:C + 4]
        return (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2

    if prune:
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))

        def chunk_lb(c):
            pc = buf_ref[0, pl.ds(c * cs, cs), C + 1:C + 4]
            clo, chi = _minmax3(pc)
            return _bbox_lb(qlo, qhi, clo, chi)
    else:
        chunk_lb = lambda c: 0.0

    def chunk_top3(c):
        """This chunk's exact 3 smallest d² per query as a (KP, tq) slab
        (full-column extraction rounds — selection stays exact)."""
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        cd = d2_of(ch)
        rows = []
        for _ in range(3):
            m = jnp.min(cd, axis=0, keepdims=True)
            rows.append(m)
            cd = jnp.where(cd == m, _INF, cd)
        rows += [jnp.full((1, tq), _INF, jnp.float32)] * (_KP - 3)
        return jnp.concatenate(rows, axis=0)

    if not prune:
        def sel_body(c, _):
            cand_ref[pl.ds(c * _KP, _KP), :] = chunk_top3(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_body, 0)
    else:
        # phase A: the tile's proportionally-positioned chunk upper-bounds
        # every query's true 3rd distance (3rd over a support subset only
        # shrinks as support grows); phase B stores candidates of every
        # chunk that could beat it
        c0 = (t * n_chunks) // n_tiles
        candA = chunk_top3(c0)
        ub = jnp.max(candA[2:3, :]) * (1.0 + 1e-4)
        cand_ref[:] = jnp.full(cand_ref.shape, _INF, cand_ref.dtype)

        def sel_cond(c, _):
            @pl.when(chunk_lb(c) <= ub)
            def _():
                cand_ref[pl.ds(c * _KP, _KP), :] = chunk_top3(c)
            return 0
        lax.fori_loop(0, n_chunks, sel_cond, 0)

    def ext_body(j, cd):
        m = jnp.min(cd, axis=0, keepdims=True)
        return jnp.where(cd == m, _INF, cd)

    cd = lax.fori_loop(0, 2, ext_body, cand_ref[:])
    thr = jnp.min(cd, axis=0, keepdims=True) * (1.0 + 1e-6)      # (1, tq)
    thr_bound = jnp.max(thr) * (1.0 + 1e-4)

    def chunk_acc(c, carry):
        acc, accw = carry
        ch = buf_ref[0, pl.ds(c * cs, cs), :]
        d2 = d2_of(ch)
        nb = d2 <= thr
        w = jnp.where(nb, 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) + 1e-8),
                      0.0)                                       # (cs, tq)
        fe = ch[:, 0:C + 1]        # [f | 1]: last output column = Σw
        acc = acc + lax.dot_general(w, fe, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
        # same sum in (1, tq) orientation for the aux output (the matmul's
        # Σw column is (tq, 1) and in-kernel transposes are relayouts)
        return acc, accw + jnp.sum(w, axis=0, keepdims=True)

    def body(c, carry):
        if not prune:
            return chunk_acc(c, carry)
        return lax.cond(chunk_lb(c) <= thr_bound,
                        lambda cr: chunk_acc(c, cr), lambda cr: cr, carry)

    acc, accw = lax.fori_loop(
        0, n_chunks, body,
        (jnp.zeros((tq, C + 1), jnp.float32),
         jnp.zeros((1, tq), jnp.float32)))
    out_ref[0] = acc[:, 0:C] / jnp.maximum(acc[:, C:C + 1], 1e-20)
    aux_ref[0, 0:1, :] = thr
    aux_ref[0, 1:2, :] = jnp.maximum(accw, 1e-20)


def _bwd_tile_sweep(qbuf_ref, sx, sy, sz, acc0, *, tq: int, prune: bool,
                    precision):
    """Sweep the query tiles of a resident qbuf block, accumulating the
    support-chunk gradient: df_j += Σ_q nb·(w_qj / Wsum_q)·g_q (one matmul
    per tile).  Query tiles whose box-to-box lower bound exceeds the tile's
    threshold bound have w ≡ 0 and are skipped (exact, same boxes as
    forward)."""
    m_blk = qbuf_ref.shape[1]
    C = qbuf_ref.shape[2] - 5
    if prune:
        clo = (jnp.min(sx), jnp.min(sy), jnp.min(sz))
        chi = (jnp.max(sx), jnp.max(sy), jnp.max(sz))

    def tile_grad(t, acc):
        qb = qbuf_ref[0, pl.ds(t * tq, tq), :]
        qx, qy, qz = qb[:, C:C + 1], qb[:, C + 1:C + 2], qb[:, C + 2:C + 3]
        thr, wsum = qb[:, C + 3:C + 4], qb[:, C + 4:C + 5]
        gq = qb[:, 0:C]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2    # (tq, cs)
        nb = d2 <= thr
        wn = jnp.where(nb, 1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) + 1e-8),
                       0.0) / wsum
        return acc + lax.dot_general(wn, gq, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32,
                                     precision=precision)

    def body(t, acc):
        if not prune:
            return tile_grad(t, acc)
        qp = qbuf_ref[0, pl.ds(t * tq, tq), C:C + 4]  # x y z thr
        qlo, qhi = _minmax3(qp)
        tb = jnp.max(qp[:, 3:4]) * (1.0 + 1e-4)
        lb = _bbox_lb(qlo, qhi, clo, chi)
        return lax.cond(lb <= tb, lambda a: tile_grad(t, a),
                        lambda a: a, acc)

    return lax.fori_loop(0, m_blk // tq, body, acc0)


def _interp_bwd_kernel(qbuf_ref, sT_ref, dfs_ref, *, tq: int, precision):
    """Whole-qbuf-resident backward: qbuf = [g(C) | x y z thr wsum];
    support chunk via sT (3, cs)."""
    sx = sT_ref[0, 0:1, :]
    sy = sT_ref[0, 1:2, :]
    sz = sT_ref[0, 2:3, :]
    cs = sx.shape[1]
    prune = _PRUNE and qbuf_ref.shape[1] // tq > 1
    dfs_ref[0] = _bwd_tile_sweep(
        qbuf_ref, sx, sy, sz,
        jnp.zeros((cs, qbuf_ref.shape[2] - 5), jnp.float32),
        tq=tq, prune=prune, precision=precision)


def _interp_bwd_big_kernel(qbuf_ref, sT_ref, dfs_ref, acc_ref, *, tq: int,
                           n_qb: int, precision):
    """Query-chunked backward for qbufs beyond VMEM residency (e.g. the
    ScanNet recipe's fp0 stage: 64000 fine points x (128+5)->256 lanes is
    ~65 MB): query blocks ride the minor grid dim, the (cs, C) gradient
    accumulator lives in scratch across the sweep, and the same per-tile
    bbox pruning runs inside each block."""
    qb_i = pl.program_id(2)
    sx = sT_ref[0, 0:1, :]
    sy = sT_ref[0, 1:2, :]
    sz = sT_ref[0, 2:3, :]

    @pl.when(qb_i == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] = _bwd_tile_sweep(qbuf_ref, sx, sy, sz, acc_ref[:], tq=tq,
                                 prune=_PRUNE, precision=precision)

    @pl.when(qb_i == n_qb - 1)
    def _final():
        dfs_ref[0] = acc_ref[:]


# whole-support VMEM residency cap for the single-call kernel; above it the
# two-call big path runs (3rd-NN threshold via the grid-chunked kNN kernel,
# then chunked accumulation) — whole-room eval rungs reach 1.2M points
_SUP_VMEM_BUDGET = 48 * 1024 * 1024

_BIG_CS = 2048  # support chunk of the grid-chunked large-N path
# query tile of the large-N path.  Chunk blocks are re-fetched per
# (tile, chunk) grid step, so DMA scales as n_tiles * n_pad * row_bytes —
# the 256-wide tile of the resident kernel cost ~3 TB of chunk DMA at the
# 884k rung (measured 4.75 s in fp0 alone); 2048 queries/tile cuts it 8x.
_BIG_TQ = 2048

# backward qbuf residency cap (S3DIS's 24k queries stay resident; the
# ScanNet recipe's 64k-query fp0 qbuf is ~65 MB and chunks) + its block
_QBUF_VMEM_BUDGET = 32 * 1024 * 1024
_QB = 4096


def _buf_vmem_bytes(n_pad: int, C: int) -> int:
    lanes = -(-(C + 4) // 128) * 128  # fp32 VMEM lane padding
    return n_pad * lanes * 4


def _interp_acc_big_kernel(qT_ref, buf_ref, out_ref, aux_ref, acc_ref,
                           accw_ref, *, C: int, n_chunks: int, prune: bool,
                           precision):
    """Large-N accumulation: support chunks ride the minor grid dim; the
    (tq, C+1) accumulator lives in scratch across the chunk sweep (same
    persistence pattern as knn_pallas._knn_kernel_big).  With kd-sorted
    support, chunks whose box-to-box lower bound exceeds the tile's
    threshold bound have w ≡ 0 and skip the d²/matmul work (the block DMA
    itself is unconditional — prefetch ignores pl.when)."""
    c = pl.program_id(2)
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    thr = qT_ref[0, 3:4, :]

    @pl.when(c == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        accw_ref[:] = jnp.zeros_like(accw_ref)

    def _accumulate():
        ch = buf_ref[0]                               # (cs, C+4)
        sx = ch[:, C + 1:C + 2]
        sy = ch[:, C + 2:C + 3]
        sz = ch[:, C + 3:C + 4]
        d2 = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2
        w = jnp.where(d2 <= thr,
                      1.0 / (jnp.sqrt(jnp.maximum(d2, 0.0)) + 1e-8), 0.0)
        acc_ref[:] = acc_ref[:] + lax.dot_general(
            w, ch[:, 0:C + 1], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        accw_ref[:] = accw_ref[:] + jnp.sum(w, axis=0, keepdims=True)

    if prune:
        clo, chi = _minmax3(buf_ref[0, :, C + 1:C + 4])
        qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
        qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))
        tb = jnp.max(thr) * (1.0 + 1e-4)

        @pl.when(_bbox_lb(qlo, qhi, clo, chi) <= tb)
        def _():
            _accumulate()
    else:
        _accumulate()

    @pl.when(c == n_chunks - 1)
    def _final():
        acc = acc_ref[:]
        out_ref[0] = acc[:, 0:C] / jnp.maximum(acc[:, C:C + 1], 1e-20)
        aux_ref[0, 0:1, :] = thr
        aux_ref[0, 1:2, :] = jnp.maximum(accw_ref[:], 1e-20)


def _top3_rows(cd, tq):
    """3 extraction rounds → list of (1, tq) rows, smallest first.  Equality
    masking drops tied copies in one round (the 3rd extracted value can only
    grow → superset neighborhoods, the documented tie-averaging semantics)."""
    rows = []
    for _ in range(3):
        m = jnp.min(cd, axis=0, keepdims=True)
        rows.append(m)
        cd = jnp.where(cd == m, _INF, cd)
    return rows


def _interp_thr_seed_kernel(qT_ref, bufp_ref, seed_ref):
    """Phase A of the large-N 3rd-NN threshold: each tile's proportionally-
    positioned chunk upper-bounds every query's true 3rd distance (the 3rd
    over a support subset only shrinks as support grows)."""
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    tq = qx.shape[1]
    ch = bufp_ref[0]                                  # (cs, 3)
    sx = ch[:, 0:1]
    sy = ch[:, 1:2]
    sz = ch[:, 2:3]
    cd = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2
    rows = _top3_rows(cd, tq)
    rows += [jnp.full((1, tq), _INF, jnp.float32)] * 5
    seed_ref[0] = jnp.concatenate(rows, axis=0)


def _interp_thr_kernel(qT_ref, seed_ref, bufp_ref, out_ref, cand_ref):
    """Phase B: running per-query top-3 d² in scratch across the kd-sorted
    chunk sweep.  A chunk is merged only if its box-to-box lower bound can
    beat the tile's current 3rd-distance bound (exact skip: a skipped chunk
    cannot contribute a top-3 member for any query in the tile); the seed
    chunk is skipped by id (its candidates are already in the scratch —
    re-merging would double-count its points and shrink the 3rd)."""
    t = pl.program_id(1)
    c = pl.program_id(2)
    n_tiles = pl.num_programs(1)
    n_chunks = pl.num_programs(2)
    qx = qT_ref[0, 0:1, :]
    qy = qT_ref[0, 1:2, :]
    qz = qT_ref[0, 2:3, :]
    tq = qx.shape[1]

    @pl.when(c == 0)
    def _init():
        cand_ref[:] = seed_ref[0]

    ch = bufp_ref[0]                                  # (cs, 3)
    clo, chi = _minmax3(ch)
    qlo = (jnp.min(qx), jnp.min(qy), jnp.min(qz))
    qhi = (jnp.max(qx), jnp.max(qy), jnp.max(qz))
    lb = _bbox_lb(qlo, qhi, clo, chi)
    bound = jnp.max(cand_ref[2:3, :]) * (1.0 + 1e-4)
    c0 = (t * n_chunks) // n_tiles                    # the seed chunk

    @pl.when(jnp.logical_and(lb <= bound, c != c0))
    def _merge():
        sx = ch[:, 0:1]
        sy = ch[:, 1:2]
        sz = ch[:, 2:3]
        cd = (sx - qx) ** 2 + (sy - qy) ** 2 + (sz - qz) ** 2
        merged = jnp.concatenate(
            [cand_ref[0:3, :]] + _top3_rows(cd, tq)
            + [jnp.full((2, tq), _INF, jnp.float32)], axis=0)   # (8, tq)
        rows = _top3_rows(merged, tq)
        rows += [jnp.full((1, tq), _INF, jnp.float32)] * 5
        cand_ref[:] = jnp.concatenate(rows, axis=0)

    @pl.when(c == n_chunks - 1)
    def _final():
        out_ref[0] = cand_ref[:]


def _interp_fwd_big(p1, p2, f2, interpret):
    """Pruned path for supports beyond VMEM residency (whole-room eval
    rungs): kd-sorted support + Morton-sorted queries, a seed/scan kernel
    pair for each fine point's 3rd-NN d² with bbox chunk skipping, then the
    chunked weighted accumulation with the same skip.  Replaces the generic
    big-kNN threshold call (unpruned, (N,128)-lane-padded outputs): fp0 at
    the 884k ladder rung measured 4.75 s acc + 3.11 s kNN before this.

    Returns (out in ORIGINAL fine order, residuals in sorted space)."""
    B, N1, _ = p1.shape
    _, N2, C = f2.shape
    n_pad = -(-N2 // _BIG_CS) * _BIG_CS
    n_chunks = n_pad // _BIG_CS
    tq = min(_BIG_TQ, -(-N1 // 8) * 8)
    m_pad = -(-N1 // tq) * tq
    n_tiles = m_pad // tq
    prune = _PRUNE and n_chunks > 1

    if prune:
        p2s, perm2, inv2 = _kd_sort(p2, n_pad, _BIG_CS)
        f2s = _gather_n(f2, perm2)
        p1s, perm1, inv1 = _morton_sort(p1)
    else:
        p2s, f2s, p1s = p2, f2, p1
        perm1 = inv1 = inv2 = None

    bufp = _pad_to(p2s, n_pad, 1, value=1e4)          # (B, n_pad, 3)
    qT = jnp.transpose(_pad_to(p1s, m_pad, 1, value=-1e4), (0, 2, 1))

    seed = pl.pallas_call(
        _interp_thr_seed_kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, _BIG_CS, 3),
                lambda b, t, _n=n_chunks, _m=n_tiles: (b, (t * _n) // _m, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tq), lambda b, t: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, m_pad), jnp.float32),
        compiler_params=_params(),
        interpret=interpret,
    )(qT, bufp)

    cand = pl.pallas_call(
        _interp_thr_kernel,
        grid=(B, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t, c: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tq), lambda b, t, c: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BIG_CS, 3), lambda b, t, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, tq), lambda b, t, c: (b, 0, t),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 8, m_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qT, seed, bufp)
    thr = cand[:, 2, :] * (1.0 + 1e-6)                # (B, m_pad), sorted
    if m_pad > N1:
        # padded queries: no members (keeps the acc tile's prune bound and
        # the backward's membership semantics identical to the small path)
        thr = jnp.where(jnp.arange(m_pad)[None] < N1, thr, -1.0)

    ones = jnp.ones((B, N2, 1), jnp.float32)
    buf = jnp.concatenate([f2s, ones, p2s], axis=-1)
    buf = _pad_to(buf, n_pad, 1, value=0.0)
    if n_pad > N2:
        buf = buf.at[:, N2:, C + 1:C + 4].set(1e4)
    qT4 = jnp.concatenate([qT, thr[:, None, :]], axis=1)   # (B, 4, m_pad)

    out, aux = pl.pallas_call(
        functools.partial(_interp_acc_big_kernel, C=C, n_chunks=n_chunks,
                          prune=prune, precision=_PREC),
        grid=(B, n_tiles, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 4, tq), lambda b, t, c: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BIG_CS, C + 4), lambda b, t, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, C), lambda b, t, c: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq), lambda b, t, c: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, m_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((tq, C + 1), jnp.float32),
                        pltpu.VMEM((1, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qT4, buf)
    out_s = out[:, :N1]
    if perm1 is not None:
        out_s = _gather_n(out_s, inv1)
    return out_s, (p1s, p2s, aux[:, 0, :N1], aux[:, 1, :N1], perm1, inv2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def three_interpolation_fused(p1, p2, f2, interpret: bool = False):
    """p1 (B,N1,3) fine, p2 (B,N2,3) coarse, f2 (B,N2,C) → (B,N1,C)."""
    out, _ = _interp_fwd_impl(p1, p2, f2, interpret)
    return out


def _sort_on(n_pad: int, cs: int) -> bool:
    return _PRUNE and n_pad // cs > 1


def _run_fwd_kernel(p1s, p2s, f2s, interpret):
    """Kernel invocation on (possibly sorted) inputs."""
    B, N1, _ = p1s.shape
    _, N2, C = f2s.shape
    n_pad, cs = _shapes_sup(N2)
    tq = min(TQ, -(-N1 // 8) * 8)
    m_pad = -(-N1 // tq) * tq
    cand_rows = _KP * (n_pad // cs)

    ones = jnp.ones((B, N2, 1), jnp.float32)
    buf = jnp.concatenate([f2s, ones, p2s], axis=-1)      # [f | 1 | xyz]
    buf = _pad_to(buf, n_pad, 1, value=0.0)
    if n_pad > N2:
        buf = buf.at[:, N2:, C + 1:C + 4].set(1e4)
    qT = jnp.transpose(_pad_to(p1s, m_pad, 1, value=-1e4), (0, 2, 1))

    out, aux = pl.pallas_call(
        functools.partial(_interp_kernel, cs=cs, C=C, precision=_PREC),
        grid=(B, m_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, C), jnp.float32),
            jax.ShapeDtypeStruct((B, 2, m_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((cand_rows, tq), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qT, buf)
    return out[:, :N1], aux[:, 0, :N1], aux[:, 1, :N1]


def _interp_fwd_impl(p1, p2, f2, interpret):
    """Returns (out in ORIGINAL fine order, residuals for the VJP).

    With pruning on, queries are Morton-sorted and the support kd-sorted
    (positions sort-carried — in-jit position gathers feeding a Pallas call
    miscompile on the remote-TPU platform; feature/output gathers are
    sound) and the residuals stay in sorted space for the backward."""
    B, N1, _ = p1.shape
    _, N2, C = f2.shape
    n_pad, cs = _shapes_sup(N2)
    if _buf_vmem_bytes(n_pad, C) > _SUP_VMEM_BUDGET:
        return _interp_fwd_big(p1, p2, f2, interpret)
    if not _sort_on(n_pad, cs):
        out, thr, wsum = _run_fwd_kernel(p1, p2, f2, interpret)
        return out, (p1, p2, thr, wsum, None, None)
    p2s, perm2, inv2 = _kd_sort(p2, n_pad, cs)
    f2s = _gather_n(f2, perm2)
    p1s, perm1, inv1 = _morton_sort(p1)
    out_s, thr_s, wsum_s = _run_fwd_kernel(p1s, p2s, f2s, interpret)
    out = _gather_n(out_s, inv1)
    return out, (p1s, p2s, thr_s, wsum_s, perm1, inv2)


def _interp_fwd(p1, p2, f2, interpret):
    out, res = _interp_fwd_impl(p1, p2, f2, interpret)
    return out, res


def _interp_bwd(interpret, res, gout):
    p1r, p2r, thr, wsum, perm1, inv2 = res
    C = gout.shape[-1]
    B, N1, _ = p1r.shape
    N2 = p2r.shape[1]
    prec = _PREC
    n_pad, cs = _shapes_sup(N2)
    tq = min(TQ, -(-N1 // 8) * 8)
    # qbuf VMEM residency gate: beyond it, query blocks ride the grid and
    # the accumulator lives in scratch (query-chunked kernel)
    qbuf_lanes = -(-(C + 5) // 128) * 128
    big = (-(-N1 // tq) * tq) * qbuf_lanes * 4 > _QBUF_VMEM_BUDGET
    if big:
        tq = TQ
        m_pad = -(-N1 // _QB) * _QB
    else:
        m_pad = -(-N1 // tq) * tq

    if perm1 is not None:
        gout = _gather_n(gout, perm1)       # into sorted query order

    qbuf = jnp.concatenate(
        [gout, p1r, thr[..., None], wsum[..., None]], axis=-1)
    qbuf = _pad_to(qbuf, m_pad, 1, value=0.0)
    if m_pad > N1:
        # padded queries: thr=-1 removes every membership; wsum=1 avoids 0/0
        qbuf = qbuf.at[:, N1:, C + 3].set(-1.0)
        qbuf = qbuf.at[:, N1:, C + 4].set(1.0)
    sT = jnp.transpose(_pad_to(p2r, n_pad, 1, value=1e4), (0, 2, 1))

    cs_sup = 512 if n_pad % 512 == 0 else n_pad
    if big:
        n_qb = m_pad // _QB
        df2 = pl.pallas_call(
            functools.partial(_interp_bwd_big_kernel, tq=tq, n_qb=n_qb,
                              precision=prec),
            grid=(B, n_pad // cs_sup, n_qb),
            in_specs=[
                pl.BlockSpec((1, _QB, C + 5), lambda b, c, q: (b, q, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, cs_sup), lambda b, c, q: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cs_sup, C), lambda b, c, q: (b, c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
            scratch_shapes=[pltpu.VMEM((cs_sup, C), jnp.float32)],
            compiler_params=_params(),
            interpret=interpret,
        )(qbuf, sT)
    else:
        df2 = pl.pallas_call(
            functools.partial(_interp_bwd_kernel, tq=tq, precision=prec),
            grid=(B, n_pad // cs_sup),
            in_specs=[
                pl.BlockSpec((1, m_pad, C + 5), lambda b, c: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, cs_sup), lambda b, c: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, cs_sup, C), lambda b, c: (b, c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
            compiler_params=_params(),
            interpret=interpret,
        )(qbuf, sT)
    df2 = df2[:, :N2]
    if inv2 is not None:
        df2 = _gather_n(df2, inv2)          # back to original support order
    return jnp.zeros((B, N1, 3), df2.dtype), jnp.zeros((B, N2, 3), df2.dtype), df2


three_interpolation_fused.defvjp(_interp_fwd, _interp_bwd)
