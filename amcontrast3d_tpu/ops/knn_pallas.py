"""Pallas TPU fused kNN: distance computation + neighbor selection in VMEM.

The jnp kNN path materializes the (B, M, N) distance matrix in HBM (9.2 GB
for a 4×24k S3DIS batch) and runs top-k over it; even with
``lax.approx_max_k`` the HBM round-trip dominates.  This kernel keeps the
distance tiles in VMEM end to end:

  grid = (B, M/TQ).  Per query tile (TQ=256):
  1. ``fori_loop`` over support chunks (CS=2048; support resident as (3, N)
     planes): d² = |q|² + |s|² − 2 q·sᵀ with the q·sᵀ on the MXU;
  2. per 128-wide support bin keep the best-2 (min + masked second-min)
     distances/indices, stored per-chunk into a (TQ, n_chunks, 2·CS/128)
     candidate cube (chunk axis = sublanes → dynamic stores are legal);
  3. ``fori_loop`` exact ascending k-extraction over the candidates
     (global min + flat-index tie-break + mask), written to (k, TQ)-ordered
     outputs (sublane-dynamic stores), transposed on the way out.

Correctness: exact while ≤2 true neighbors share a 128-bin.  The wrapper
pre-permutes support with a fixed random permutation so spatially-sorted
inputs (eval rooms) spread neighbors uniformly over bins; expected recall
≥99.8% at k=24.  The reference CUDA kNN is exact
(knnquery_cuda_kernel.cu:65-108); ``AMC3D_KNN_BACKEND=exact`` restores
bit-exact neighbor sets at ~10× the cost.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import numpy as np


@functools.lru_cache(maxsize=64)
def _perm(n: int) -> np.ndarray:
    """Fixed support permutation, host-side constant (a traced
    jax.random.permutation would add a device sort to every kNN call)."""
    return np.random.RandomState(17).permutation(n).astype(np.int32)

_INF = 1e10
_BIGI = 1 << 30


def _ball_prune_on() -> bool:
    """Slab-sorted chunk pruning for the large-N ball query (exact
    membership; k-subset under overflow follows the slab-shuffled priority
    order — same deviation class as the uniform permutation)."""
    import os
    return os.environ.get("AMC3D_BALL_PRUNED", "auto") != "off"
TQ = 256          # query tile
BIN = 128         # support bin (lane width)
CS = 2048         # support chunk per inner step


def _knn_kernel(q_ref, s_ref, oi_ref, od_ref, d2_ref, cd_ref, ci_ref,
                *, k: int, n_pad: int, radius2: float = None):
    """radius2=None → kNN (select k smallest d²).  radius2=r² → ball query:
    select the k smallest *indices* among in-ball points (↔ the CUDA
    ball query's first-k-in-index-order over shuffled points,
    ball_query_gpu.cu:15-51; indices here are post-permutation, i.e. a
    uniform random k of the in-ball set)."""
    q = q_ref[0]                       # (TQ, 3)
    tq = q.shape[0]
    qx = q[:, 0:1]
    qy = q[:, 1:2]
    qz = q[:, 2:3]
    nbc = CS // BIN                    # bins per chunk
    n_chunks = n_pad // CS
    nb = n_pad // BIN
    bin_col = lax.broadcasted_iota(jnp.int32, (tq, BIN), 1)

    # static chunk loop; d2 routed through one scratch buffer so chunks
    # serialize (RAW/WAR through the ref) and peak VMEM stays one tile.
    # Distances use broadcast per-coordinate VPU ops — a K=3 MXU dot would
    # contract over physically-padded (uninitialized) sublanes on TPU.
    for c in range(n_chunks):
        sx = s_ref[0, 0:1, c * CS:(c + 1) * CS]    # (1, CS)
        sy = s_ref[0, 1:2, c * CS:(c + 1) * CS]
        sz = s_ref[0, 2:3, c * CS:(c + 1) * CS]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
        if radius2 is not None:
            # selection value = global index (in-ball) / huge (out-of-ball)
            col_g = lax.broadcasted_iota(
                jnp.int32, (tq, CS), 1).astype(jnp.float32) + float(c * CS)
            d2 = jnp.where(d2 < radius2, col_g, _INF + col_g)
        d2_ref[:] = d2
        for b in range(nbc):
            blk = d2_ref[:, b * BIN:(b + 1) * BIN]  # (TQ, BIN)
            gbin = c * nbc + b
            m1 = jnp.min(blk, axis=1, keepdims=True)
            a1 = jnp.argmin(blk, axis=1).astype(jnp.int32)[:, None]
            blk2 = jnp.where(bin_col == a1, _INF, blk)
            m2 = jnp.min(blk2, axis=1, keepdims=True)
            a2 = jnp.argmin(blk2, axis=1).astype(jnp.int32)[:, None]
            base = gbin * BIN
            cd_ref[:, gbin:gbin + 1] = m1
            ci_ref[:, gbin:gbin + 1] = a1 + base
            cd_ref[:, nb + gbin:nb + gbin + 1] = m2
            ci_ref[:, nb + gbin:nb + gbin + 1] = a2 + base

    cand_col = lax.broadcasted_iota(jnp.int32, (tq, 2 * nb), 1)
    # static k-extraction; in-place cd_ref updates serialize iterations
    for j in range(k):
        cand_d = cd_ref[:]
        m = jnp.min(cand_d, axis=1, keepdims=True)
        pos = jnp.argmin(cand_d, axis=1).astype(jnp.int32)[:, None]
        onehot = cand_col == pos
        idx = jnp.sum(jnp.where(onehot, ci_ref[:], 0), axis=1, keepdims=True)
        od_ref[0, :, j:j + 1] = m
        oi_ref[0, :, j:j + 1] = idx
        cd_ref[:] = jnp.where(onehot, _INF, cand_d)


def _knn_kernel_big(q_ref, s_ref, oi_ref, od_ref, cd_ref, ci_ref,
                    *, k: int, n_chunks: int, cs: int,
                    radius2: float = None):
    """Large-N variant: the support-chunk loop is the innermost GRID
    dimension, so Pallas pipelines (3, CS) support blocks from HBM instead
    of holding the whole (3, N) planes resident; per-chunk best-2 candidates
    accumulate in a (n_chunks, TQ, 2·nbc) scratch cube (leading untiled dim →
    dynamic stores are fine), and the exact k-extraction runs on the last
    chunk step.  Compile time is O(1) in N."""
    c = pl.program_id(2)
    q = q_ref[0]
    tq = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    nbc = cs // BIN
    bin_col = lax.broadcasted_iota(jnp.int32, (tq, BIN), 1)

    sx = s_ref[0, 0:1, :]
    sy = s_ref[0, 1:2, :]
    sz = s_ref[0, 2:3, :]
    d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
    if radius2 is not None:
        # transform the whole chunk to index-priorities up front — slicing
        # two separately-derived values per bin tripped a Mosaic layout
        # check; a single pre-transformed d2 matches the kNN path's shape
        col_g = (lax.broadcasted_iota(jnp.int32, (tq, cs), 1)
                 + c * cs).astype(jnp.float32)
        d2 = jnp.where(d2 < radius2, col_g, _INF + col_g)
    ms, gs = [], []
    for b in range(nbc):
        blk = d2[:, b * BIN:(b + 1) * BIN]
        m1 = jnp.min(blk, axis=1, keepdims=True)
        a1 = jnp.argmin(blk, axis=1).astype(jnp.int32)[:, None]
        blk2 = jnp.where(bin_col == a1, _INF, blk)
        m2 = jnp.min(blk2, axis=1, keepdims=True)
        a2 = jnp.argmin(blk2, axis=1).astype(jnp.int32)[:, None]
        ms.extend([m1, m2])
        gs.extend([a1 + b * BIN, a2 + b * BIN])
    cd_ref[pl.ds(c, 1), :, :] = jnp.concatenate(ms, axis=1)[None]
    ci_ref[pl.ds(c, 1), :, :] = (jnp.concatenate(gs, axis=1) + c * cs)[None]

    @pl.when(c == n_chunks - 1)
    def _extract():
        sub = lax.broadcasted_iota(jnp.int32, (n_chunks, tq, 2 * nbc), 0)
        lane = lax.broadcasted_iota(jnp.int32, (n_chunks, tq, 2 * nbc), 2)
        flat = sub * (2 * nbc) + lane
        oi_ref[0] = jnp.zeros_like(oi_ref[0])
        od_ref[0] = jnp.zeros_like(od_ref[0])
        for j in range(k):
            cand = cd_ref[:]                                # (NC, TQ, L)
            m = jnp.min(cand, axis=(0, 2), keepdims=True)   # (1, TQ, 1)
            sel = jnp.where(cand == m, flat, _BIGI)
            pos = jnp.min(sel, axis=(0, 2), keepdims=True)
            onehot = flat == pos
            idx = jnp.sum(jnp.where(onehot, ci_ref[:], 0), axis=(0, 2),
                          keepdims=True)                    # (1, TQ, 1)
            od_ref[0, :, j:j + 1] = m[0]
            oi_ref[0, :, j:j + 1] = idx[0]
            cd_ref[:] = jnp.where(onehot, _INF, cand)


# static unroll compiles fastest for the common train sizes; the fori
# variant keeps compile time flat for whole-room eval (N up to ~1M)
_BIG_N = 32768
TQ_BIG = 64       # small tile keeps the unrolled extraction working set in VMEM
CS_BIG = 8192     # chunk → 2·nbc = 128 candidate lanes exactly (no padding)


def _ball_kernel_value(q_ref, s_ref, od_ref, d2_ref, cd_ref, *, k: int,
                       n_pad: int, radius2: float):
    """Value-only ball query: the selection value IS the index priority
    (in-ball → global index, a float-exact integer < 2²⁴; out-of-ball →
    _INF + index, don't-care).  Best-2-per-bin and the k-extraction need no
    argmin and no index side-arrays — half the VPU passes and half the
    candidate scratch of the index-tracking kernel.  Valid priorities are
    unique, so per-bin tie masking is exact; invalid slots may collapse,
    which only reorders don't-care padding."""
    q = q_ref[0]                       # (TQ, 3)
    tq = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    nbc = CS // BIN
    n_chunks = n_pad // CS
    nb = n_pad // BIN

    for c in range(n_chunks):
        sx = s_ref[0, 0:1, c * CS:(c + 1) * CS]
        sy = s_ref[0, 1:2, c * CS:(c + 1) * CS]
        sz = s_ref[0, 2:3, c * CS:(c + 1) * CS]
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
        col_g = lax.broadcasted_iota(
            jnp.int32, (tq, CS), 1).astype(jnp.float32) + float(c * CS)
        d2_ref[:] = jnp.where(d2 < radius2, col_g, _INF + col_g)
        for b in range(nbc):
            blk = d2_ref[:, b * BIN:(b + 1) * BIN]
            gbin = c * nbc + b
            m1 = jnp.min(blk, axis=1, keepdims=True)
            m2 = jnp.min(jnp.where(blk == m1, _INF, blk), axis=1,
                         keepdims=True)
            cd_ref[:, gbin:gbin + 1] = m1
            cd_ref[:, nb + gbin:nb + gbin + 1] = m2

    for j in range(k):
        cand = cd_ref[:]
        m = jnp.min(cand, axis=1, keepdims=True)
        od_ref[0, :, j:j + 1] = m
        cd_ref[:] = jnp.where(cand == m, _INF, cand)


def _ball_kernel_value_big(q_ref, s_ref, slack_ref, od_ref, cd_ref, *,
                           k: int, n_chunks: int, cs: int, radius2: float,
                           prune: bool):
    """Large-N value-only ball query (support chunks on the grid, as
    _knn_kernel_big).  With slab-sorted support (prune=True), chunks whose
    box-to-box lower bound exceeds r² (+ extent-derived absolute fp32
    slack) contain no in-ball point for any query in the tile — their
    candidate rows are filled with a sentinel and the d²/bin work skipped
    (exact: membership is unchanged)."""
    c = pl.program_id(2)
    q = q_ref[0]
    tq = q.shape[0]
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    nbc = cs // BIN

    sx = s_ref[0, 0:1, :]
    sy = s_ref[0, 1:2, :]
    sz = s_ref[0, 2:3, :]

    def _cands():
        d2 = (qx - sx) ** 2 + (qy - sy) ** 2 + (qz - sz) ** 2
        col_g = (lax.broadcasted_iota(jnp.int32, (tq, cs), 1)
                 + c * cs).astype(jnp.float32)
        v = jnp.where(d2 < radius2, col_g, _INF + col_g)
        ms = []
        for b in range(nbc):
            blk = v[:, b * BIN:(b + 1) * BIN]
            m1 = jnp.min(blk, axis=1, keepdims=True)
            m2 = jnp.min(jnp.where(blk == m1, _INF, blk), axis=1,
                         keepdims=True)
            ms.extend([m1, m2])
        cd_ref[pl.ds(c, 1), :, :] = jnp.concatenate(ms, axis=1)[None]

    if prune:
        lb = 0.0
        for lo, hi, qc in ((jnp.min(sx), jnp.max(sx), qx),
                           (jnp.min(sy), jnp.max(sy), qy),
                           (jnp.min(sz), jnp.max(sz), qz)):
            gap = jnp.maximum(
                jnp.maximum(lo - jnp.max(qc), jnp.min(qc) - hi), 0.0)
            lb = lb + gap * gap
        hit = lb <= radius2 + slack_ref[0, 0]

        @pl.when(hit)
        def _():
            _cands()

        @pl.when(jnp.logical_not(hit))
        def _():
            cd_ref[pl.ds(c, 1), :, :] = jnp.full(
                (1, tq, 2 * nbc), 2.0 * _INF, jnp.float32)
    else:
        _cands()

    @pl.when(c == n_chunks - 1)
    def _extract():
        od_ref[0] = jnp.zeros_like(od_ref[0])
        for j in range(k):
            cand = cd_ref[:]                               # (NC, TQ, L)
            m = jnp.min(cand, axis=(0, 2), keepdims=True)  # (1, TQ, 1)
            od_ref[0, :, j:j + 1] = m[0]
            cd_ref[:] = jnp.where(cand == m, _INF, cand)


def _call_kernel(q, planes, k, n_pad, B, m_pad_unused=None, radius2=None,
                 interpret=False):
    kpad = -(-k // BIN) * BIN
    big = n_pad > _BIG_N
    tile = TQ_BIG if big else TQ
    M = q.shape[1]
    m_pad = -(-M // tile) * tile
    if m_pad != M:
        q = jnp.pad(q, ((0, 0), (0, m_pad - M), (0, 0)))
    if big:
        n_chunks = n_pad // CS_BIG
        kern = functools.partial(_knn_kernel_big, k=k, n_chunks=n_chunks,
                                 cs=CS_BIG, radius2=radius2)
        return pl.pallas_call(
            kern,
            grid=(B, m_pad // tile, n_chunks),
            in_specs=[
                pl.BlockSpec((1, tile, 3), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, CS_BIG), lambda b, t, c: (b, 0, c),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile, kpad), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile, kpad), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.int32),
                jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((n_chunks, tile, 2 * (CS_BIG // BIN)), jnp.float32),
                pltpu.VMEM((n_chunks, tile, 2 * (CS_BIG // BIN)), jnp.int32),
            ],
            interpret=interpret,
        )(q, planes)
    kern = functools.partial(_knn_kernel, k=k, n_pad=n_pad,
                             radius2=radius2)
    scratch = [
        pltpu.VMEM((tile, CS), jnp.float32),
        pltpu.VMEM((tile, 2 * (n_pad // BIN)), jnp.float32),
        pltpu.VMEM((tile, 2 * (n_pad // BIN)), jnp.int32),
    ]
    return pl.pallas_call(
        kern,
        grid=(B, m_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile, kpad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, kpad), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.int32),
            jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.float32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(q, planes)


def _call_ball_value(q, planes, k, n_pad, B, radius2, interpret=False,
                     slack=None):
    kpad = -(-k // BIN) * BIN
    big = n_pad > _BIG_N
    tile = TQ_BIG if big else TQ
    M = q.shape[1]
    m_pad = -(-M // tile) * tile
    if m_pad != M:
        q = jnp.pad(q, ((0, 0), (0, m_pad - M), (0, 0)))
    if big:
        n_chunks = n_pad // CS_BIG
        prune = slack is not None
        if slack is None:
            slack = jnp.zeros((1, 1), jnp.float32)
        kern = functools.partial(_ball_kernel_value_big, k=k,
                                 n_chunks=n_chunks, cs=CS_BIG,
                                 radius2=radius2, prune=prune)
        return pl.pallas_call(
            kern,
            grid=(B, m_pad // tile, n_chunks),
            in_specs=[
                pl.BlockSpec((1, tile, 3), lambda b, t, c: (b, t, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, CS_BIG), lambda b, t, c: (b, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda b, t, c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, tile, kpad), lambda b, t, c: (b, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n_chunks, tile, 2 * (CS_BIG // BIN)),
                           jnp.float32),
            ],
            interpret=interpret,
        )(q, planes, slack)
    kern = functools.partial(_ball_kernel_value, k=k, n_pad=n_pad,
                             radius2=radius2)
    return pl.pallas_call(
        kern,
        grid=(B, m_pad // tile),
        in_specs=[
            pl.BlockSpec((1, tile, 3), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, n_pad), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, kpad), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, kpad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile, CS), jnp.float32),
            pltpu.VMEM((tile, 2 * (n_pad // BIN)), jnp.float32),
        ],
        interpret=interpret,
    )(q, planes)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(support: jnp.ndarray, query: jnp.ndarray, k: int,
               interpret: bool = False):
    """support (B, N, 3), query (B, M, 3) → (idx (B, M, k) int32, d² (B, M, k)).

    Ascending distance; ties broken by candidate-slot order (not guaranteed
    lowest-index, unlike the exact path)."""
    B, N, _ = support.shape
    M = query.shape[1]
    assert k <= 2 * ((N + BIN - 1) // BIN), "k exceeds candidate capacity"

    # fixed permutation so index bins are spatially uniform for any input order
    perm = jnp.asarray(_perm(N))
    sup = jnp.take(support, perm, axis=1)

    gran = CS_BIG if N > _BIG_N else CS
    n_pad = -(-N // gran) * gran
    if n_pad != N:
        sup = jnp.pad(sup, ((0, 0), (0, n_pad - N), (0, 0)),
                      constant_values=1e4)

    planes = jnp.transpose(sup, (0, 2, 1))            # (B, 3, n_pad)

    oi, od = _call_kernel(query, planes, k, n_pad, B,
                          interpret=interpret)
    oi = oi[:, :M, :k]
    od = od[:, :M, :k]
    # un-permute support indices; padded sentinels cannot win (d²≈3e8)
    oi = jnp.take(perm, jnp.clip(oi, 0, N - 1), axis=0).astype(jnp.int32)
    return oi, od


@functools.partial(jax.jit, static_argnames=("radius", "k", "interpret"))
def ball_query_pallas(support: jnp.ndarray, query: jnp.ndarray, radius: float,
                      k: int, interpret: bool = False) -> jnp.ndarray:
    """Fused ball query: k in-ball support indices per query (B, M, k).

    Selection values are in-ball indices (post-permutation) so the extracted
    "distances" encode validity: slots ≥ _INF had no in-ball point and are
    padded with the first valid slot (or 0 when the ball is empty), matching
    the CUDA kernel's padding (ball_query_gpu.cu:40-47)."""
    B, N, _ = support.shape
    M = query.shape[1]

    if N > _BIG_N and _ball_prune_on():
        # Pruned large-N layout: kd-sort into CS_BIG coordinate slabs
        # (tight chunk bboxes → exact r² chunk skipping) with a FIXED
        # permutation WITHIN each slab — best-2-per-128-lane-bin candidate
        # capacity needs spatially uniform bins, which a fully sorted
        # layout would destroy (a ball would land in 1-2 bins and overflow
        # them).  Selection priority becomes the slab-shuffled position —
        # same documented deviation class as the uniform permutation (the
        # k-subset under ball overflow differs from CUDA's scan order).
        from .contrast_pallas import _kd_sort, _morton_sort

        n_pad = -(-N // CS_BIG) * CS_BIG
        ps, perm_kd, _ = _kd_sort(support, n_pad, CS_BIG)
        if n_pad != N:
            ps = jnp.pad(ps, ((0, 0), (0, n_pad - N), (0, 0)),
                         constant_values=1e4)
            perm_kd = jnp.pad(perm_kd, ((0, 0), (0, n_pad - N)))
        wp = _perm(CS_BIG)
        wix = jnp.asarray(
            (np.arange(n_pad, dtype=np.int64) // CS_BIG * CS_BIG
             + np.tile(wp, n_pad // CS_BIG)).astype(np.int32))
        sup = jnp.take(ps, wix, axis=1)          # static-index take (sound)
        perm_total = jnp.take(perm_kd, wix, axis=1)      # (B, n_pad)
        planes = jnp.transpose(sup, (0, 2, 1))
        # absolute fp32 slack for the skip bound (~32 ulp at the squared
        # coordinate magnitude — the pruned-FPS precedent: a relative
        # bound is unsafe at small distances)
        m_ext = jnp.maximum(jnp.max(jnp.abs(support)), 1.0)  # real rows only
        slack = (32.0 * 1.2e-7 * m_ext * m_ext).reshape(1, 1)

        # Morton-sort the queries so each TQ_BIG tile is spatially local —
        # pruning compares tile-box to chunk-box, and an unsorted tile
        # spans the whole cloud (measured: zero chunks skipped).  Positions
        # are sort-carried; the output rows are un-sorted afterwards
        # (kernel-output gathers are sound on this platform).
        qs, _, inv_q = _morton_sort(query)
        od = _call_ball_value(qs, planes, k, n_pad, B,
                              radius2=float(radius) ** 2,
                              interpret=interpret,
                              slack=slack.astype(jnp.float32))
        od = jnp.take_along_axis(od[:, :M, :k], inv_q[..., None], axis=1)
        valid = od < _INF
        oi = jnp.clip(od.astype(jnp.int32), 0, n_pad - 1)
        oi = jnp.take_along_axis(perm_total, oi.reshape(B, -1),
                                 axis=1).reshape(B, M, k).astype(jnp.int32)
        first = jnp.where(valid[..., :1], oi[..., :1], 0)
        return jnp.where(valid, oi, first)

    perm = jnp.asarray(_perm(N))
    sup = jnp.take(support, perm, axis=1)

    gran = CS_BIG if N > _BIG_N else CS
    n_pad = -(-N // gran) * gran
    if n_pad != N:
        sup = jnp.pad(sup, ((0, 0), (0, n_pad - N), (0, 0)),
                      constant_values=1e4)
    planes = jnp.transpose(sup, (0, 2, 1))

    od = _call_ball_value(query, planes, k, n_pad, B,
                          radius2=float(radius) ** 2, interpret=interpret)
    od = od[:, :M, :k]
    valid = od < _INF
    # the selection value IS the (post-permutation) index: float-exact for
    # valid slots (< 2^24); invalid slots are don't-care garbage
    oi = od.astype(jnp.int32)
    oi = jnp.take(perm, jnp.clip(oi, 0, N - 1), axis=0).astype(jnp.int32)
    # pad invalid slots with the first in-ball index; all-empty balls → 0
    # (zero-init reference semantics, ball_query_gpu.cu:40-47)
    first = jnp.where(valid[..., :1], oi[..., :1], 0)
    return jnp.where(valid, oi, first)
