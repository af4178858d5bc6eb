"""Pallas TPU kernel for furthest point sampling.

The XLA ``fori_loop`` FPS (ops/fps.py) round-trips the (B, N) min-distance
buffer through HBM every iteration and pays loop dispatch overhead ~npoint
times.  This kernel keeps coordinates and the distance buffer resident in
VMEM for the whole sampling loop and advances ALL clouds in the batch per
iteration on the VPU:

  * layout: x/y/z as (B, N) planes (lane dim = points), mind (B, N) scratch;
  * the previously selected point is materialized per row with a one-hot
    mask-reduce (no dynamic lane indexing);
  * argmax with lowest-index tie-breaking via ``where(mind==max, iota, N)``
    + min-reduce, matching the CUDA kernel's scan-order tie behavior
    (``sampling_gpu.cu:101-160``) and the numpy oracle;
  * indices are written row-wise into a (npoint, B) output (dynamic stores
    on the sublane dim are cheap).

B == 1 (the whole-room eval path) uses a separate large-N variant: each
(N,) plane is reshaped to (8, N/8) — a (1, N) VMEM buffer sublane-pads 1→8
and wastes 8× the footprint — and output rows are chunked over a sequential
grid with mind/last persisted in scratch, so the (npoint, 128-lane-padded)
output block stays small.  Together these keep the kernel inside scoped
VMEM up to the 1.2M-point ladder rungs.  The batched (B > 1) kernel is the
round-2-proven single-block form, untouched: training shapes (npoint ≤
N/stride ≤ 6000) never approach the limit, and the gridded wrapper showed
runtime faults at batched eval shapes on the remote-TPU platform.

Semantics identical to ``ops.fps.furthest_point_sample``: first index 0,
exact max-min sampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10

# output rows per grid step in the B==1 large-npoint kernel
_TO = 4096


def _pin(out: jnp.ndarray) -> jnp.ndarray:
    """Materialize the multi-call B==1 index output before any consumer.

    Platform trap (r3 device bisection): letting a downstream gather fuse
    across the multi-call aliased FPS chain corrupts the per-call index
    outputs — a composite ``fps -> take_along_axis`` jit at 442k points
    returned INT32_MAX (the _BIG tie-sentinel cast) for most rows while
    FPS in isolation was exact.  An ``optimization_barrier`` on the
    concatenated output pins its materialization ahead of the consumer
    fusion and restores bit-exactness (verified on device; see
    tests_device/test_kernels_device.py::test_fps_composite_gather)."""
    return lax.optimization_barrier(out)


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, npoint: int):
    B, N = x_ref.shape
    col = lax.broadcasted_iota(jnp.int32, (B, N), 1)

    mind_ref[:] = jnp.full((B, N), _INF, dtype=jnp.float32)
    out_ref[0, :] = jnp.zeros((B,), dtype=jnp.int32)

    x, y, z = x_ref[:], y_ref[:], z_ref[:]

    def body(j, last):
        onehot = (col == last).astype(jnp.float32)  # (B, N)
        px = jnp.sum(x * onehot, axis=1, keepdims=True)
        py = jnp.sum(y * onehot, axis=1, keepdims=True)
        pz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        m = jnp.max(mind, axis=1, keepdims=True)
        cand = jnp.where(mind == m, col, N)
        nxt = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)  # (B,1)
        out_ref[pl.ds(j, 1), :] = nxt.reshape(1, B)
        return nxt

    lax.fori_loop(1, npoint, body, jnp.zeros((B, 1), dtype=jnp.int32))


def _fps_kernel_r8(x_ref, y_ref, z_ref, mind_in_ref, last_in_ref, first_ref,
                   out_ref, mind_ref, last_ref, *,
                   to: int, n_real: int, n_steps: int):
    """B==1 variant on (R, N/R)-reshaped planes with grid-chunked output
    rows; ``col`` carries the global (row-major) index so lowest-index
    tie-breaking is unchanged.  (mind, last) stream in/out as ALIASED
    arrays (input_output_aliases) so state persists across the host-side
    call splits without doubling the VMEM footprint — whole-room rungs
    past ~850k points fault the chip on larger footprints.  The aliased
    out refs hold the input values on entry; the _in refs are never read.

    The carry between iterations/calls is the selected point's
    COORDINATES in an (8, 128) f32 tile (sublanes 0-2, lane 0) — device
    bisection r3 found that a (1, 1) int32 aliased ref does NOT hold the
    input value on entry on this platform (reads garbage → the onehot
    matched nothing and every call re-seeded FPS from the ORIGIN); full
    f32 tiles alias correctly, and carrying coords also drops the 3
    full-array one-hot extraction passes per iteration."""
    R, N8 = x_ref.shape
    i = pl.program_id(0)
    col = (lax.broadcasted_iota(jnp.int32, (R, N8), 0) * N8
           + lax.broadcasted_iota(jnp.int32, (R, N8), 1))

    @pl.when(jnp.logical_and(i == 0, first_ref[0, 0] == 1))
    def _first():
        # the very first call: first output row is index 0
        out_ref[0, :] = jnp.zeros((1,), dtype=jnp.int32)

    x, y, z = x_ref[:], y_ref[:], z_ref[:]

    def body(r, carry):
        px, py, pz = carry
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], jnp.where(mind_ref[:] < 0.0, -1.0, d))
        mind_ref[:] = mind
        m = jnp.max(mind)
        cand = jnp.where(mind == m, col, n_real)
        nxt = jnp.min(cand).astype(jnp.int32)
        nsel = jnp.where((mind == m) & (col == nxt), 1.0, 0.0)
        out_ref[pl.ds(r, 1), :] = nxt.reshape(1, 1)
        return (jnp.sum(x * nsel), jnp.sum(y * nsel), jnp.sum(z * nsel))

    start = jnp.where(jnp.logical_and(i == 0, first_ref[0, 0] == 1), 1, 0)
    init = (last_ref[0, 0], last_ref[1, 0], last_ref[2, 0])
    px, py, pz = lax.fori_loop(start, to, body, init, unroll=False)
    row8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    last_ref[:, 0:1] = jnp.where(row8 == 0, px,
                                 jnp.where(row8 == 1, py,
                                           jnp.where(row8 == 2, pz, 0.0)))


# per-call iteration budget: keep each Mosaic call to ~1-2 s on v5e
# (measured ~4e11 VPU elem-ops/s on this kernel)
_B1_OPS_BUDGET = 1.2e10


# max lane width of the reshaped planes: (R, n8) buffers with n8 past
# ~98k lanes hard-fault the chip at runtime (884k rung: n8=110592 faulted,
# 93184 ran); stay at ≤64k lanes and grow the sublane dim instead
_B1_MAX_LANES = 65536


def _fps_b1(x, y, z, N: int, npoint: int, interpret: bool) -> jnp.ndarray:
    rows = 8
    while -(-N // rows) > _B1_MAX_LANES:
        rows += 8
    n8 = -(-N // rows)
    n_pad = rows * n8
    if n_pad > N:
        x = jnp.pad(x, ((0, 0), (0, n_pad - N)))
        y = jnp.pad(y, ((0, 0), (0, n_pad - N)))
        z = jnp.pad(z, ((0, 0), (0, n_pad - N)))
    x, y, z = (a.reshape(rows, n8) for a in (x, y, z))

    outer = int(_B1_OPS_BUDGET // max(n_pad, 1))
    outer = max(_TO, (outer // _TO) * _TO)
    col = (jnp.arange(rows, dtype=jnp.int32)[:, None] * n8
           + jnp.arange(n8, dtype=jnp.int32)[None, :])
    mind = jnp.where(col < N, _INF, -1.0).astype(jnp.float32)
    # (8, 128) f32 coord-carry tile seeded with point 0 (see kernel note)
    last = (jnp.zeros((8, 128), jnp.float32)
            .at[0, 0].set(x[0, 0]).at[1, 0].set(y[0, 0])
            .at[2, 0].set(z[0, 0]))

    outs = []
    done = 0
    while done < npoint:
        cnt = min(outer, npoint - done)
        to = cnt if cnt <= 4 * _TO else _TO
        n_steps = -(-cnt // to)
        first = jnp.full((1, 1), 1 if done == 0 else 0, jnp.int32)
        idx, mind, last = pl.pallas_call(
            functools.partial(_fps_kernel_r8, to=to, n_real=N,
                              n_steps=n_steps),
            grid=(n_steps,),
            out_shape=[jax.ShapeDtypeStruct((n_steps * to, 1), jnp.int32),
                       jax.ShapeDtypeStruct((rows, n8), jnp.float32),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            in_specs=[pl.BlockSpec((rows, n8), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 3
                     + [pl.BlockSpec((rows, n8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((to, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((rows, n8), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            input_output_aliases={3: 1, 4: 2},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(x, y, z, mind, last, first)
        outs.append(idx[:cnt])
        done += cnt
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return _pin(out).T


# ---------------------------------------------------------------------------
# chunk-pruned B==1 variant (whole-room eval rungs)
#
# The dense B==1 kernel scans all N points every iteration (~17-34 µs/iter
# at 884k) even though a new sample only lowers min-distances within its
# shrinking coverage radius.  This variant kd-sorts the cloud into
# contiguous-slab chunks (same machinery as ops/contrast_pallas) and keeps
# per-chunk running stats (max min-distance + its argmin-index); each
# iteration then
#   * skips every chunk whose bbox lower-bound distance to the new sample
#     is >= its current max min-distance (those chunks provably cannot
#     change — conservative 1e-6 slack keeps the skip exact under float
#     rounding), and
#   * takes the global argmax from the per-chunk stats instead of a full
#     N-scan.
# Min-distance VALUES are bit-identical to the dense kernel (same formula,
# same operands, update skipping is exact), and ties break by lowest
# ORIGINAL index exactly as the dense kernel / CUDA scan order
# (sampling_gpu.cu:101-160) — the kd order only changes which lanes hold
# which point.  Steady state visits O(1) chunks -> 5-10x fewer VPU ops at
# ladder scale.  Dispatch is env-gated (AMC3D_FPS_PRUNED) until
# device-validated.
# ---------------------------------------------------------------------------

import os as _os

# default "auto" since the r3 device A/B: bit-exact vs the dense kernel
# and 1.8x faster at 262k (1358 vs 2394 ms), 118x at 442k (3.3 s vs 388 s
# — the dense kernel hits a >32k-lane VMEM-traffic cliff the chunked
# layout never sees).  Training (B>1) is unaffected; this gates only the
# B==1 whole-room eval path at N >= AMC3D_FPS_PRUNED_MIN.
_PRUNED = _os.environ.get("AMC3D_FPS_PRUNED", "auto")   # off | auto | on
_PRUNED_MIN_N = int(_os.environ.get("AMC3D_FPS_PRUNED_MIN", "262144"))
_PRUNE_CS = int(_os.environ.get("AMC3D_FPS_PRUNE_CS", "32768"))
_BIG = 3e38


def set_fps_pruned(mode: str):
    global _PRUNED
    assert mode in ("off", "auto", "on")
    _PRUNED = mode
    # the mode is read at trace time inside the jit-wrapped dispatcher and
    # is NOT part of its cache key — drop traced executables so a toggle
    # takes effect for already-seen (shape, npoint) combinations
    furthest_point_sample_pallas.clear_cache()


def _fps_kernel_pruned(x_ref, y_ref, z_ref, oidx_ref, blo_ref, bhi_ref,
                       mind_in_ref, last_in_ref, first_ref, slack_ref,
                       out_ref, mind_ref, last_ref, stats_ref, *, to: int,
                       n_chunks: int, rpc: int, L: int):
    """stats_ref rows: lane0 = cmax, lane1 = carg (original idx, float),
    lanes2-4 = the candidate point's coordinates.  mind/last are aliased
    i/o; stats are scratch, rebuilt at the start of every pallas call.

    The previously selected point's COORDINATES ride in the fori carry and
    the aliased ``last`` row (sublanes 0-2, lane 0) rather than being
    re-read from the coordinate planes at a carry-derived row: a dynamic
    sublane slice whose start comes from the loop carry hard-faults the
    chip on this platform (device-bisected r3 — loop-INDEX-derived slices
    and the full-array one-hot extraction are both fine, carry-derived
    starts are not).  Selecting the winner's coords from the (ncp, 128)
    stats table costs O(n_chunks) instead of the O(N) one-hot scan the
    dense kernel pays, preserving the pruned kernel's point."""
    i = pl.program_id(0)
    lane8 = lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    E0 = (lane8 == 0).astype(jnp.float32)
    E1 = (lane8 == 1).astype(jnp.float32)
    E2 = (lane8 == 2).astype(jnp.float32)
    lane128 = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    R0 = (lane128 == 0).astype(jnp.float32)
    R1 = (lane128 == 1).astype(jnp.float32)
    R2 = (lane128 == 2).astype(jnp.float32)
    R3 = (lane128 == 3).astype(jnp.float32)
    R4 = (lane128 == 4).astype(jnp.float32)

    def chunk_stats(c):
        rs = pl.ds(c * rpc, rpc)
        mn = mind_ref[rs, :]
        cmax = jnp.max(mn)
        om = oidx_ref[rs, :]
        corig = jnp.min(jnp.where(mn == cmax, om, _BIG))
        # exactly one element matches (original indices are unique per
        # chunk), so the masked sums read the candidate's coordinates
        mf = jnp.where((mn == cmax) & (om == corig), 1.0, 0.0)
        cx = jnp.sum(x_ref[rs, :] * mf)
        cy = jnp.sum(y_ref[rs, :] * mf)
        cz = jnp.sum(z_ref[rs, :] * mf)
        stats_ref[pl.ds(c, 1), :] = (cmax * R0 + corig * R1
                                     + cx * R2 + cy * R3 + cz * R4)

    @pl.when(i == 0)
    def _rebuild():
        stats_ref[:] = jnp.broadcast_to(-2.0 * R0, stats_ref.shape)

        def body0(c, _):
            chunk_stats(c)
            return 0
        lax.fori_loop(0, n_chunks, body0, 0)

    @pl.when(jnp.logical_and(i == 0, first_ref[0, 0] == 1))
    def _first():
        out_ref[0, :] = jnp.zeros((1,), dtype=jnp.int32)

    def body(r, carry):
        px, py, pz = carry
        pv = px * E0 + py * E1 + pz * E2

        slack = slack_ref[0, 0]
        def upd(c, _):
            lo = blo_ref[pl.ds(c, 1), :]
            hi = bhi_ref[pl.ds(c, 1), :]
            d = jnp.maximum(jnp.maximum(lo - pv, pv - hi), 0.0)
            lb2 = jnp.sum(d * d)
            cmax = jnp.sum(stats_ref[pl.ds(c, 1), 0:1])

            # conservative skip: fp32 error on d² is ABSOLUTE in the
            # coordinate magnitude (|coord|²·eps), so an extent-derived
            # absolute slack — not a relative one — guarantees that a
            # skipped chunk can contain no point whose computed d² falls
            # below its min-distance (bit-equality with the dense kernel)
            @pl.when(lb2 - slack < cmax)
            def _():
                rs = pl.ds(c * rpc, rpc)
                d2 = ((x_ref[rs, :] - px) ** 2 + (y_ref[rs, :] - py) ** 2
                      + (z_ref[rs, :] - pz) ** 2)
                mn = jnp.minimum(mind_ref[rs, :], d2)
                mind_ref[rs, :] = mn
                chunk_stats(c)
            return 0

        lax.fori_loop(0, n_chunks, upd, 0)

        S = stats_ref[:]
        gmax = jnp.max(S[:, 0:1])
        eq = S[:, 0:1] == gmax
        nxt_orig = jnp.min(jnp.where(eq, S[:, 1:2], _BIG))
        # winner row: cmax==gmax AND carg==nxt_orig — unique, since original
        # indices are disjoint across chunks
        wsel = jnp.where(eq & (S[:, 1:2] == nxt_orig), 1.0, 0.0)
        nx = jnp.sum(wsel * S[:, 2:3])
        ny = jnp.sum(wsel * S[:, 3:4])
        nz = jnp.sum(wsel * S[:, 4:5])
        out_ref[pl.ds(r, 1), :] = nxt_orig.astype(jnp.int32).reshape(1, 1)
        return (nx, ny, nz)

    start = jnp.where(jnp.logical_and(i == 0, first_ref[0, 0] == 1), 1, 0)
    # aliased out ref holds the input value on entry; _in ref never read
    init = (last_ref[0, 0], last_ref[1, 0], last_ref[2, 0])
    px, py, pz = lax.fori_loop(start, to, body, init, unroll=False)
    row8 = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    last_ref[:, 0:1] = jnp.where(row8 == 0, px,
                                 jnp.where(row8 == 1, py,
                                           jnp.where(row8 == 2, pz, 0.0)))


def _fps_b1_pruned(x, y, z, N: int, npoint: int, interpret: bool):
    from .contrast_pallas import _kd_sort

    csp = _PRUNE_CS
    n_chunks = -(-N // csp)
    n_pad = n_chunks * csp

    xyz = jnp.stack([x[0], y[0], z[0]], axis=-1)[None]       # (1, N, 3)
    ps, perm, inv = _kd_sort(xyz, n_pad, csp)
    ps, perm = ps[0], perm[0].astype(jnp.float32)            # (N, 3), (N,)
    if n_pad > N:
        ps = jnp.concatenate(
            [ps, jnp.broadcast_to(ps[N - 1:N], (n_pad - N, 3))], axis=0)
        perm = jnp.concatenate(
            [perm, jnp.full((n_pad - N,), -1.0, jnp.float32)])
    seed = (x[0, 0], y[0, 0], z[0, 0])
    return _fps_pruned_core(ps, perm, seed, npoint, csp, interpret)


def _fps_pruned_core(ps, perm, seed, npoint: int, csp: int,
                     interpret: bool):
    """Run the chunk-pruned sampler on ONE kd-sorted cloud.

    ps (n_pad, 3) sorted+padded positions, perm (n_pad,) float32 original
    indices (-1 on pad rows), seed = coords of ORIGINAL point 0 (the first
    FPS pick).  Factored out of ``_fps_b1_pruned`` so the batched training
    path can reuse it per cloud after ONE batched kd-sort (which CSEs with
    the contrast kernels' sort of the same full-res positions)."""
    n_pad = ps.shape[0]
    n_chunks = n_pad // csp
    L = max(128, min(2048, csp // 8))
    assert csp % L == 0
    rpc = csp // L
    R = n_pad // L

    bb = ps.reshape(n_chunks, csp, 3)
    ncp = -(-n_chunks // 8) * 8
    blo = jnp.zeros((ncp, 8), jnp.float32).at[:n_chunks, :3].set(
        jnp.min(bb, axis=1))
    bhi = jnp.zeros((ncp, 8), jnp.float32).at[:n_chunks, :3].set(
        jnp.max(bb, axis=1))
    xs = ps[:, 0].reshape(R, L)
    ys = ps[:, 1].reshape(R, L)
    zs = ps[:, 2].reshape(R, L)
    oidx = perm.reshape(R, L)
    mind = jnp.where(oidx >= 0.0, _INF, -1.0).astype(jnp.float32)
    # coords of original point 0 (the first FPS pick) seed the carry row
    last = (jnp.zeros((8, 128), jnp.float32)
            .at[0, 0].set(seed[0]).at[1, 0].set(seed[1])
            .at[2, 0].set(seed[2]))
    # absolute fp32 slack for the skip bound: ~32 ulp at the squared
    # coordinate magnitude (see kernel comment)
    m = jnp.maximum(jnp.max(jnp.abs(ps)), 1.0)
    slack = (32.0 * 1.2e-7 * m * m).reshape(1, 1).astype(jnp.float32)

    outer = int(_B1_OPS_BUDGET // max(n_pad, 1))
    outer = max(_TO, (outer // _TO) * _TO)
    outs = []
    done = 0
    while done < npoint:
        cnt = min(outer, npoint - done)
        to = cnt if cnt <= 4 * _TO else _TO
        n_steps = -(-cnt // to)
        first = jnp.full((1, 1), 1 if done == 0 else 0, jnp.int32)
        idx, mind, last = pl.pallas_call(
            functools.partial(_fps_kernel_pruned, to=to, n_chunks=n_chunks,
                              rpc=rpc, L=L),
            grid=(n_steps,),
            out_shape=[jax.ShapeDtypeStruct((n_steps * to, 1), jnp.int32),
                       jax.ShapeDtypeStruct((R, L), jnp.float32),
                       jax.ShapeDtypeStruct((8, 128), jnp.float32)],
            in_specs=[pl.BlockSpec((R, L), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)] * 4
                     + [pl.BlockSpec((ncp, 8), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)] * 2
                     + [pl.BlockSpec((R, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)]
                     + [pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)] * 2,
            out_specs=[pl.BlockSpec((to, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((R, L), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, 128), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)],
            input_output_aliases={6: 1, 7: 2},
            scratch_shapes=[pltpu.VMEM((ncp, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(xs, ys, zs, oidx, blo, bhi, mind, last, first, slack)
        outs.append(idx[:cnt])
        done += cnt
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return _pin(out).T


# ---------------------------------------------------------------------------
# chunk-pruned B>1 variant (training shapes) — MEASURED LOSER, default off
#
# The dense batched kernel scans all B*N lanes every iteration; at the
# flagship stage-1 shape (B=4, 24000 -> 6000 samples) that is ~12 ms of the
# 13 ms FPS bucket.  This path kd-sorts the whole batch ONCE — with the
# contrast kernels' (n_pad, cs) so XLA CSE merges it with the loss-side sort
# of the same full-res positions (HLO-verified) — then runs the proven
# pruned core per cloud.  Indices are bit-identical to the dense kernel
# (device-verified at the flagship shape).
#
# Device A/B (v5e, B=4 x 24000 -> 6000, pipelined reps, one scalar fetch):
# dense 15.1 ms vs pruned 74.1 ms — pruning LOSES 5x at training scale.
# Serializing clouds through the B==1 core runs 4x6000 = 24000 sequential
# iterations (vs 6000 lockstep), and at 2048-point chunks the per-iteration
# O(n_chunks) scalar loop overhead dwarfs the lanes pruning saves; the
# B==1 ladder win (1.8-118x at >=262k) needs 32k-point chunks to amortize.
# Kept as a validated exact alternative (AMC3D_FPS_PRUNED_TRAIN=off|on,
# default off); don't re-litigate without a lockstep-batched stats kernel.
# There is deliberately NO 'auto' here: per the measurement above the
# pruned core never wins at training scale, so 'auto' would be a trap.
# ---------------------------------------------------------------------------

_PRUNED_TRAIN = _os.environ.get("AMC3D_FPS_PRUNED_TRAIN", "off")
if _PRUNED_TRAIN not in ("off", "on"):
    _PRUNED_TRAIN = "off"


def set_fps_pruned_train(mode: str):
    global _PRUNED_TRAIN
    assert mode in ("off", "on")
    _PRUNED_TRAIN = mode
    furthest_point_sample_pallas.clear_cache()  # see set_fps_pruned


def _fps_pruned_batched(xyz: jnp.ndarray, npoint: int, interpret: bool):
    from .contrast_pallas import _kd_sort, _shapes

    B, N, _ = xyz.shape
    n_pad, cs, _ = _shapes(N)     # align with the contrast sort → CSE
    ps, perm, _ = _kd_sort(xyz, n_pad, cs)
    perm = perm.astype(jnp.float32)
    if n_pad > N:
        ps = jnp.concatenate(
            [ps, jnp.broadcast_to(ps[:, N - 1:N], (B, n_pad - N, 3))],
            axis=1)
        perm = jnp.concatenate(
            [perm, jnp.full((B, n_pad - N), -1.0, jnp.float32)], axis=1)
    outs = [
        _fps_pruned_core(ps[b], perm[b],
                         (xyz[b, 0, 0], xyz[b, 0, 1], xyz[b, 0, 2]),
                         npoint, cs, interpret)
        for b in range(B)
    ]
    return jnp.concatenate(outs, axis=0)          # (B, npoint)


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) → idx (B, npoint) int32 (VMEM-resident Pallas FPS)."""
    B, N, _ = xyz.shape
    planes = xyz.transpose(2, 0, 1)  # (3, B, N)
    x, y, z = planes[0], planes[1], planes[2]
    if B == 1:
        if (_PRUNED == "on"
                or (_PRUNED == "auto" and N >= _PRUNED_MIN_N
                    and N >= 2 * _PRUNE_CS)):
            return _fps_b1_pruned(x, y, z, N, npoint, interpret)
        return _fps_b1(x, y, z, N, npoint, interpret)
    if _PRUNED_TRAIN == "on":
        return _fps_pruned_batched(xyz, npoint, interpret)
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.T
