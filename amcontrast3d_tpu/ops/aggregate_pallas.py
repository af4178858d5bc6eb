"""Fused grouped-aggregation reductions: slot one-hot gather-reduce.

The separable local-aggregation tail (models/pointnext.py `_grouped_tail`,
↔ reference ``models/layers/group.py:76-203`` + the first grouped conv of
``LocalAggregation``/``SetAbstraction``) is the encoder's HBM hot spot: it
gathers a (B, M, K, C) neighbor-feature tensor, adds the dp projection,
batch-norms, activates and max-pools over K — hundreds of MB of
random-access HBM traffic per block forward, and a scatter-add of the same
size in the backward.  This kernel family removes the grouped tensor
entirely.

Key algebra: with the separable decomposition ``W·[dp; f_j] = (W_f·f_j +
W_dp·p_j) − W_dp·p_i = u_j − qp_i``, every grouped value is a per-SUPPORT
vector ``u_j`` minus a per-QUERY vector.  BatchNorm + any monotone
activation + max-pool therefore only need, per query and channel,

  * the signed extremum  ``ext = s ⊙ max_k (s ⊙ u_{idx[i,k]})``
    (s = sign of the effective BN scale: the post-BN affine is monotone
    per channel, so the pool commutes with it through the extremum in the
    right direction), and
  * the slot moments ``Σ_k u_{idx[i,k]}`` and ``Σ_k u²_{idx[i,k]}``
    (BN batch statistics of the virtual grouped tensor reconstruct in
    closed form, including the reference ball query's repeat-padding —
    the padded slots are literal entries of ``idx``).

Selection is UNCHANGED: ``idx`` comes from the existing ball query / kNN,
so this path adds zero approximation over the gather path — it is a pure
re-implementation of gather+BN+act+maxpool up to float associativity.

Kernel shape (per (batch, query-tile) grid step):

  1. support resident as ``buf = [u | x y z origidx]`` (kd-sorted so chunk
     bounding boxes are tight; ``origidx`` is the PRE-sort index so the
     caller's ``idx`` values match without re-indexing); query slot
     indices resident as (K, tq) rows.  Chunks whose box-to-box lower
     bound to the query tile exceeds radius² cannot contain any selected
     member (ball-query members are strictly within radius of their
     query) and are skipped — exact pruning, same machinery as
     ops/contrast_pallas.py.
  2. per surviving chunk, the gather is a batched one-hot matmul: slot
     one-hots ``oh[j, (k,i)] = (origidx_j == idx[i,k])`` contracted with
     the chunk's ``u`` on the MXU.  fp32 exactness comes from a 3×bf16
     mantissa split (8+8+8 = 24 bits; each one-hot row has a single
     nonzero, so every product and the 3-term sum are exact).
  3. the (K·tq, C) slot values live only in VMEM scratch; the extremum and
     moments reduce them to (tq, 3C) before anything returns to HBM.

The custom VJP re-expresses both the max-pool backward and the scatter-add
as support-side matmuls: per-slot weights ``γ_k = g_sum + 2·G_k·g_sq +
eq_k/Σeq · g_ext`` (the eq/count split exactly matches ``jnp.max``'s
even tie split, which the gather path produces — including the ties the
repeat-padded slots create), then ``du_chunk += ohᵀ · γ`` (2×bf16 split).

No gradient flows to positions or ``idx`` (integer selection), matching
the gather path where only features are differentiated.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .contrast_pallas import (_bbox_lb, _gather_n, _kd_sort, _minmax3,
                              _morton_sort, _pad_to)

TQ = 256          # query tile
CS = 512          # support chunk (finer than contrast's 2048: pruning
                  # granularity matters more here — the per-pair work is
                  # K× heavier)
_INF = 3e38

_SPLITS = int(os.environ.get("AMC3D_AGG_SPLITS", "3"))
_PRUNE = os.environ.get("AMC3D_AGG_PRUNE", "1") != "0"
_SORT = os.environ.get("AMC3D_AGG_SORT", "1") != "0"
_VMEM_LIMIT = 100 * 1024 * 1024

# 'auto' → fused aggregation tail on TPU; 'on' forces it (interpret-mode
# off-TPU, for tests); 'off' keeps the gather path.
_AGG_FUSED = os.environ.get("AMC3D_AGG_FUSED", "off")


def set_agg_fused(mode: str):
    """'auto' | 'on' | 'off'."""
    global _AGG_FUSED
    assert mode in ("auto", "on", "off")
    _AGG_FUSED = mode


def agg_fused_enabled() -> bool:
    return (_AGG_FUSED != "off"
            and (_AGG_FUSED == "on" or jax.default_backend() == "tpu"))


def agg_fused_fits(n: int, c: int, k: int) -> bool:
    """VMEM residency bound: support buf + du block + slot scratch must fit
    (large-N whole-room eval keeps the streamed gather tail instead).
    The buf's C+4 columns lane-pad to C+128 (f32 VMEM arrays pad the lane
    dim to a 128 multiple), so the aux columns cost a full 128 lanes."""
    cp = -(-c // 128) * 128
    _, tq, n_pad, _ = _agg_shapes(8, n)
    need = n_pad * (2 * cp + 128) * 4 + k * TQ * cp * 4
    return need <= 64 * 1024 * 1024


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _slot_group(K: int) -> int:
    """Slots per one-hot matmul group (must divide K)."""
    for kg in (4, 2, 1):
        if K % kg == 0:
            return kg
    return 1


def _mantissa_pieces(u, splits: int):
    """fp32 → up to 3 bf16 pieces whose exact sum reconstructs ≥ splits·8
    mantissa bits (3 → bit-exact fp32 for normal values)."""
    pieces = []
    rem = u
    for _ in range(splits - 1):
        hi = rem.astype(jnp.bfloat16)
        pieces.append(hi)
        rem = rem - hi.astype(jnp.float32)
    pieces.append(rem.astype(jnp.bfloat16))
    return pieces


def _slot_gather(ch, idxT_ref, C, K, tq, splits, g_ref):
    """One chunk's contribution to every slot value: G[k·tq+i, c] +=
    u[j, c] where origidx_j == idx[i, k].  One-hot rows have ≤1 nonzero, so
    the bf16-split matmuls are exact."""
    prio = ch[:, C + 3:C + 4]                                  # (cs, 1)
    u = ch[:, 0:C]
    pieces = _mantissa_pieces(u, splits)
    kg_sz = _slot_group(K)
    for kg in range(K // kg_sz):
        ohs = []
        for k in range(kg * kg_sz, (kg + 1) * kg_sz):
            row = idxT_ref[0, k:k + 1, :]                      # (1, tq)
            ohs.append((prio == row).astype(jnp.bfloat16))     # (cs, tq)
        oh = ohs[0] if kg_sz == 1 else jnp.concatenate(ohs, axis=1)
        acc = jnp.zeros((kg_sz * tq, C), jnp.float32)
        for piece in pieces:
            acc = acc + lax.dot_general(
                oh, piece, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        r0 = kg * kg_sz * tq
        g_ref[r0:r0 + kg_sz * tq, :] += acc


def _chunk_lb(buf_ref, c, cs, C, qlo, qhi):
    pc = buf_ref[0, pl.ds(c * cs, cs), C:C + 3]
    clo, chi = _minmax3(pc)
    return _bbox_lb(qlo, qhi, clo, chi)


def _query_box(qposT_ref):
    qx = qposT_ref[0, 0:1, :]
    qy = qposT_ref[0, 1:2, :]
    qz = qposT_ref[0, 2:3, :]
    return ((jnp.min(qx), jnp.min(qy), jnp.min(qz)),
            (jnp.max(qx), jnp.max(qy), jnp.max(qz)))


def _fwd_kernel(qposT_ref, idxT_ref, sgn_ref, qp_ref, buf_ref, out_ref,
                g_ref, *, cs: int, C: int, K: int, splits: int,
                radius2: float, need_stats: bool):
    tq = qposT_ref.shape[2]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1 and radius2 is not None

    g_ref[:] = jnp.zeros(g_ref.shape, jnp.float32)

    if prune:
        qlo, qhi = _query_box(qposT_ref)
        r2b = radius2 * (1.0 + 1e-4)

    def body(c, _):
        def run():
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            _slot_gather(ch, idxT_ref, C, K, tq, splits, g_ref)
        if prune:
            @pl.when(_chunk_lb(buf_ref, c, cs, C, qlo, qhi) <= r2b)
            def _():
                run()
        else:
            run()
        return 0

    lax.fori_loop(0, n_chunks, body, 0)

    s = sgn_ref[0, 0:1, :]                                     # (1, C)
    ext = jnp.full((tq, C), -_INF, jnp.float32)
    su = jnp.zeros((tq, C), jnp.float32)
    sq = jnp.zeros((tq, C), jnp.float32)
    if need_stats:
        qp = qp_ref[0]                                         # (tq, C)
    for k in range(K):
        gk = g_ref[k * tq:(k + 1) * tq, :]
        ext = jnp.maximum(ext, gk * s)
        if need_stats:
            # moments of h = u_slot − qp accumulate in h-space — computing
            # them from u-moments (E[u²] − 2qp·E[u] + qp²) cancels
            # catastrophically when u and qp are large and correlated
            hk = gk - qp
            su = su + hk
            sq = sq + hk * hk
    out_ref[0, :, 0:C] = ext * s
    if need_stats:
        out_ref[0, :, C:2 * C] = su
        out_ref[0, :, 2 * C:3 * C] = sq


def _bwd_kernel(qposT_ref, idxT_ref, sgn_ref, qp_ref, extT_ref, gT_ref,
                buf_ref, du_ref, g_ref, *, cs: int, C: int, K: int,
                splits: int, radius2: float):
    """du[j] += Σ_{i,k: idx[i,k]==j} γ_k[i] with γ the per-slot upstream
    weight.  Grid over query tiles; the full (n_pad, C) du block stays
    resident and accumulates across tiles (index map constant in t)."""
    t = pl.program_id(1)
    tq = qposT_ref.shape[2]
    n_pad = buf_ref.shape[1]
    n_chunks = n_pad // cs
    prune = _PRUNE and n_chunks > 1 and radius2 is not None
    kg_sz = _slot_group(K)

    @pl.when(t == 0)
    def _():
        du_ref[0] = jnp.zeros(du_ref.shape[1:], jnp.float32)

    g_ref[:] = jnp.zeros(g_ref.shape, jnp.float32)

    if prune:
        qlo, qhi = _query_box(qposT_ref)
        r2b = radius2 * (1.0 + 1e-4)

    # pass A: rebuild the slot values G
    def body_a(c, _):
        def run():
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            _slot_gather(ch, idxT_ref, C, K, tq, splits, g_ref)
        if prune:
            @pl.when(_chunk_lb(buf_ref, c, cs, C, qlo, qhi) <= r2b)
            def _():
                run()
        else:
            run()
        return 0

    lax.fori_loop(0, n_chunks, body_a, 0)

    # per-slot weights γ_k (overwrite G in place, row block by row block;
    # eq/Σeq reproduces jnp.max's even tie split, incl. repeat-pad ties)
    s = sgn_ref[0, 0:1, :]
    ext_s = extT_ref[0] * s                                    # (tq, C)
    g_ext = gT_ref[0, :, 0:C]
    g_sum = gT_ref[0, :, C:2 * C]
    g_sq = gT_ref[0, :, 2 * C:3 * C]
    ties = jnp.zeros((tq, C), jnp.float32)
    for k in range(K):
        gk = g_ref[k * tq:(k + 1) * tq, :]
        ties = ties + jnp.where(gk * s == ext_s, 1.0, 0.0)
    gext_n = g_ext / jnp.maximum(ties, 1.0)
    qp = qp_ref[0]
    for k in range(K):
        gk = g_ref[k * tq:(k + 1) * tq, :]
        eq = jnp.where(gk * s == ext_s, 1.0, 0.0)
        g_ref[k * tq:(k + 1) * tq, :] = (g_sum + 2.0 * (gk - qp) * g_sq
                                         + eq * gext_n)

    # pass B: du_chunk += ohᵀ · γ (2×bf16 split on γ)
    def body_b(c, _):
        def run():
            ch = buf_ref[0, pl.ds(c * cs, cs), :]
            prio = ch[:, C + 3:C + 4]
            acc = jnp.zeros((cs, C), jnp.float32)
            for kg in range(K // kg_sz):
                ohs = []
                for k in range(kg * kg_sz, (kg + 1) * kg_sz):
                    row = idxT_ref[0, k:k + 1, :]
                    ohs.append((prio == row).astype(jnp.bfloat16))
                oh = ohs[0] if kg_sz == 1 else jnp.concatenate(ohs, axis=1)
                gam = g_ref[kg * kg_sz * tq:(kg + 1) * kg_sz * tq, :]
                for piece in _mantissa_pieces(gam, 2):
                    acc = acc + lax.dot_general(
                        oh, piece, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
            du_ref[0, pl.ds(c * cs, cs), :] += acc
        if prune:
            @pl.when(_chunk_lb(buf_ref, c, cs, C, qlo, qhi) <= r2b)
            def _():
                run()
        else:
            run()
        return 0

    lax.fori_loop(0, n_chunks, body_b, 0)


def _agg_shapes(M: int, N: int):
    tq = min(TQ, -(-M // 8) * 8)
    m_pad = -(-M // tq) * tq
    cs = min(CS, -(-N // 8) * 8)
    n_pad = -(-N // cs) * cs
    return m_pad, tq, n_pad, cs


def _prep(sup_p, q_p, u, idxf, oidx):
    """Pad + orient kernel operands.  Support/query positions are
    edge-padded (replicating real points keeps the pruning boxes tight);
    padded support rows get origidx −2 (never matches) and padded query
    slots −1."""
    B, N, C = u.shape
    M, K = idxf.shape[1], idxf.shape[2]
    m_pad, tq, n_pad, cs = _agg_shapes(M, N)

    buf = jnp.concatenate(
        [u.astype(jnp.float32), sup_p, oidx[..., None]], axis=-1)
    if n_pad > N:
        tail = jnp.concatenate(
            [jnp.zeros((B, n_pad - N, C), jnp.float32),
             jnp.broadcast_to(sup_p[:, N - 1:N], (B, n_pad - N, 3)),
             jnp.full((B, n_pad - N, 1), -2.0)], axis=-1)
        buf = jnp.concatenate([buf, tail], axis=1)

    qpos = q_p
    if m_pad > M:
        qpos = jnp.concatenate(
            [qpos, jnp.broadcast_to(qpos[:, M - 1:M], (B, m_pad - M, 3))],
            axis=1)
    qposT = jnp.transpose(qpos, (0, 2, 1))                     # (B, 3, m_pad)

    idxT = jnp.transpose(_pad_to(idxf, m_pad, 1, value=-1.0), (0, 2, 1))
    return buf, qposT, idxT, m_pad, tq, n_pad, cs


def _sgnT(sgn, C):
    return jnp.broadcast_to(sgn.astype(jnp.float32)[None, None, :],
                            (1, 8, C))


def _run_fwd(sup_p, q_p, u, qp, idxf, oidx, sgn, radius2, splits,
             need_stats, interpret):
    B, N, C = u.shape
    M, K = idxf.shape[1], idxf.shape[2]
    buf, qposT, idxT, m_pad, tq, n_pad, cs = _prep(sup_p, q_p, u, idxf, oidx)
    qpT = _pad_to(qp, m_pad, 1)
    ncols = 3 * C if need_stats else C
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, cs=cs, C=C, K=K, splits=splits,
                          radius2=radius2, need_stats=need_stats),
        grid=(B, m_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, ncols), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, ncols), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K * tq, C), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qposT, idxT, _sgnT(sgn, C), qpT, buf)
    return out[:, :M]


def _run_bwd(sup_p, q_p, u, qp, idxf, oidx, sgn, ext, gout, radius2, splits,
             interpret):
    B, N, C = u.shape
    M, K = idxf.shape[1], idxf.shape[2]
    buf, qposT, idxT, m_pad, tq, n_pad, cs = _prep(sup_p, q_p, u, idxf, oidx)
    qpT = _pad_to(qp, m_pad, 1)
    extT = _pad_to(ext, m_pad, 1)
    gT = _pad_to(gout, m_pad, 1)
    du = pl.pallas_call(
        functools.partial(_bwd_kernel, cs=cs, C=C, K=K, splits=splits,
                          radius2=radius2),
        grid=(B, m_pad // tq),
        in_specs=[
            pl.BlockSpec((1, 3, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, tq), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, C), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 3 * C), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, C + 4), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_pad, C), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K * tq, C), jnp.float32)],
        compiler_params=_params(),
        interpret=interpret,
    )(qposT, idxT, _sgnT(sgn, C), qpT, extT, gT, buf)
    return du[:, :N]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _slot_reduce_core(sup_p, q_p, u, qp, idxf, oidx, sgn, radius2, splits,
                      need_stats, interpret):
    return _run_fwd(sup_p, q_p, u, qp, idxf, oidx, sgn, radius2, splits,
                    need_stats, interpret)


def _src_fwd(sup_p, q_p, u, qp, idxf, oidx, sgn, radius2, splits,
             need_stats, interpret):
    out = _run_fwd(sup_p, q_p, u, qp, idxf, oidx, sgn, radius2, splits,
                   need_stats, interpret)
    return out, (sup_p, q_p, u, qp, idxf, oidx, sgn, out)


def _src_bwd(radius2, splits, need_stats, interpret, res, gout):
    sup_p, q_p, u, qp, idxf, oidx, sgn, out = res
    C = u.shape[-1]
    ext = out[..., :C]
    if not need_stats:
        gout = jnp.concatenate(
            [gout, jnp.zeros(gout.shape[:-1] + (2 * gout.shape[-1],),
                             gout.dtype)], axis=-1)
        dqp = jnp.zeros_like(qp)
    else:
        # qp enters every moment slot linearly (h = u_slot − qp):
        # d su/dqp = −K, d sq/dqp = −2·Σh = −2·su
        K = idxf.shape[-1]
        su = out[..., C:2 * C]
        dqp = -(K * gout[..., C:2 * C]
                + 2.0 * gout[..., 2 * C:3 * C] * su).astype(qp.dtype)
    du = _run_bwd(sup_p, q_p, u, qp, idxf, oidx, sgn, ext, gout, radius2,
                  splits, interpret)
    return (jnp.zeros_like(sup_p), jnp.zeros_like(q_p),
            du.astype(u.dtype), dqp, jnp.zeros_like(idxf),
            jnp.zeros_like(oidx), jnp.zeros_like(sgn))


_slot_reduce_core.defvjp(_src_fwd, _src_bwd)


def grouped_slot_reduce(sup_p, q_p, u, idx, sgn, radius=None,
                        need_stats=True, qp=None, splits=None,
                        interpret=False):
    """Fused grouped gather + reductions over neighbor slots.

    sup_p (B, N, 3) support positions, q_p (B, M, 3) query positions,
    u (B, N, C) per-support values, idx (B, M, K) int32 slot indices
    (ball-query/kNN output, repeats allowed), sgn (C,) ±1 extremum
    direction.  Returns (ext, sum, sumsq), each (B, M, C) float32, where
    ext[i, c] = sgn_c · max_k (sgn_c · u[idx[i, k], c]) and the moments run
    over the K slots (need_stats=False skips them — eval-mode BN).

    ``qp`` (B, M, C, optional): per-query offset subtracted from every slot
    value INSIDE the kernel before the moment accumulation (the extremum
    stays in u-space).  The BN use case is h = u_slot − qp with |h| ≪ |u|:
    reconstructing E[h²] from u-moments cancels catastrophically, while
    in-kernel accumulation is exact to fp32 rounding.  Differentiable in
    ``u`` and ``qp`` (the latter host-side in closed form).

    ``radius``: when idx came from a ball query with this radius, chunks
    farther than it from the query tile are skipped (exact).  Pass None
    for kNN indices (no pruning bound).

    Max-pool ties split evenly, matching ``jnp.max``.  Multi-chunk shapes
    are kd/Morton-sorted in (and un-sorted on the way out) so the bbox
    pruning fires; positions are sort-carried and the pre-sort index rides
    along as the one-hot key (never gathered — see
    ops/contrast_pallas._morton_sort)."""
    B, N, C = u.shape
    M = q_p.shape[1]
    if splits is None:
        splits = 1 if u.dtype == jnp.bfloat16 else _SPLITS
    radius2 = None if radius is None else float(radius) ** 2
    # materialize the operands: without this, the grad-mode XLA program
    # feeds the kernel (and its residuals) from a re-fused recompute of the
    # producing convs whose values differ at bf16 magnitude from the plain
    # forward's (device-bisected r3: plain fwd exact vs gather path, fwd
    # under value_and_grad off by ~3e-2 max; barrier → bit-exact again)
    sup_p, q_p, u = jax.lax.optimization_barrier((sup_p, q_p, u))
    if qp is None:
        qp = jnp.zeros((B, M, C), jnp.float32)
    else:
        qp = jax.lax.optimization_barrier(qp)
    # lane-pad channels to a 128 multiple (padded cols are zero and get
    # sliced off)
    Cp = -(-C // 128) * 128
    if Cp > C:
        u = _pad_to(u.astype(jnp.float32), Cp, 2)
        sgn = jnp.concatenate([sgn.astype(jnp.float32),
                               jnp.ones((Cp - C,), jnp.float32)])
    qp = _pad_to(qp.astype(jnp.float32), Cp, 2) if Cp > C else \
        qp.astype(jnp.float32)
    idxf = idx.astype(jnp.float32)
    sup_p = jax.lax.stop_gradient(sup_p)
    q_p = jax.lax.stop_gradient(q_p)
    m_pad, tq, n_pad, cs = _agg_shapes(M, N)
    if _SORT and n_pad // cs > 1:
        ps, perm, _ = _kd_sort(sup_p, n_pad, cs)
        u_s = _gather_n(u, perm)
        oidx = perm.astype(jnp.float32)           # pre-sort index per row
        qs, qperm, qinv = _morton_sort(q_p)
        idx_s = _gather_n(idxf, qperm)
        qp_s = _gather_n(qp, qperm)
        out = _slot_reduce_core(ps, qs, u_s, qp_s, idx_s, oidx, sgn,
                                radius2, splits, need_stats, interpret)
        out = _gather_n(out, qinv)
    else:
        oidx = jnp.broadcast_to(
            jnp.arange(N, dtype=jnp.float32)[None], (B, N))
        out = _slot_reduce_core(sup_p, q_p, u, qp, idxf, oidx, sgn,
                                radius2, splits, need_stats, interpret)
    ext = out[..., :C]
    if not need_stats:
        return ext, None, None
    return ext, out[..., Cp:Cp + C], out[..., 2 * Cp:2 * Cp + C]
