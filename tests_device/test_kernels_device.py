"""Compiled-Pallas kernel correctness on real TPU hardware.

The CPU suite (tests/test_knn_pallas.py, tests/test_fps_pallas.py) covers the
same kernels in ``interpret=True`` mode only; a Mosaic layout/lowering
regression in the compiled kernels — the thing training actually runs —
would pass CPU CI silently.  This tier executes the compiled kernels against
the exact jnp paths at training shapes (VERDICT r1 weak #1).

Exactness bars match the documented deviations (docs/DEVIATIONS.md §2-3):
kNN is ≥0.995-recall approximate (bin-collision losses), ball query returns
a uniform-random k-subset of the in-ball set (reference CUDA returns an
arbitrary first-k, ball_query_gpu.cu:15-51), FPS is bit-exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.ops.fps import _furthest_point_sample_lax
from amcontrast3d_tpu.ops.fps_pallas import furthest_point_sample_pallas
from amcontrast3d_tpu.ops.knn import _ball_query_jnp, _knn_jnp, set_knn_backend
from amcontrast3d_tpu.ops.knn_pallas import ball_query_pallas, knn_pallas

pytestmark = pytest.mark.tpu


def _clouds(rng, b, n, scale=4.0):
    return jnp.asarray(rng.rand(b, n, 3).astype(np.float32) * scale)


def _recall(idx, oracle_idx):
    k = idx.shape[-1]
    hits = 0
    idx, oracle_idx = np.asarray(idx), np.asarray(oracle_idx)
    flat_i = idx.reshape(-1, k)
    flat_o = oracle_idx.reshape(-1, k)
    for a, o in zip(flat_i, flat_o):
        hits += len(set(a.tolist()) & set(o.tolist()))
    return hits / flat_i.size


@pytest.mark.parametrize("n,m,k", [(24000, 24000, 24),   # train self-kNN
                                   (24000, 6000, 4)])    # subscene kr=4
def test_knn_compiled_recall(rng, n, m, k):
    """The Pallas kernel dispatches only above 16k support (below that its
    best-2-per-bin candidate pool is too small — measured 0.969 recall at
    N=6k; the jnp approx_max_k backend covers mid N, tested below)."""
    sup = _clouds(rng, 2, n)
    q = sup[:, :m] if m <= n else _clouds(rng, 2, m)
    idx, d2 = jax.block_until_ready(knn_pallas(sup, q, k))
    set_knn_backend("exact")
    try:
        oidx, od2 = _knn_jnp(sup, q, k)
    finally:
        set_knn_backend("auto")
    assert _recall(idx, oidx) >= 0.995
    d2 = np.asarray(d2)
    assert np.all(np.diff(d2, axis=-1) >= -1e-5), "distances not ascending"
    sup_np, q_np = np.asarray(sup), np.asarray(q)
    check = np.random.RandomState(1).choice(m, 64, replace=False)
    for b in range(2):
        for i in check:
            true_d = ((q_np[b, i] - sup_np[b, np.asarray(idx)[b, i]]) ** 2).sum(-1)
            np.testing.assert_allclose(d2[b, i], true_d, rtol=1e-3, atol=1e-4)


def test_knn_dispatched_mid_n_recall(rng):
    """The public knn() at mid N (≤16k support) uses approx_max_k tiles."""
    from amcontrast3d_tpu.ops.knn import knn

    sup = _clouds(rng, 2, 6000)
    idx, _ = jax.block_until_ready(knn(sup, sup, 24))
    set_knn_backend("exact")
    try:
        oidx, _ = _knn_jnp(sup, sup, 24)
    finally:
        set_knn_backend("auto")
    assert _recall(idx, oidx) >= 0.985


def test_knn_compiled_self_first(rng):
    p = _clouds(rng, 2, 24000)
    idx, d2 = knn_pallas(p, p, 24)
    np.testing.assert_array_equal(np.asarray(idx)[..., 0],
                                  np.arange(24000)[None].repeat(2, 0))
    assert np.allclose(np.asarray(d2)[..., 0], 0.0, atol=1e-4)


def test_knn_compiled_large_n_grid_chunked(rng):
    """N > _BIG_N dispatches the grid-chunked variant (whole-room eval)."""
    sup = _clouds(rng, 1, 65536, scale=8.0)
    q = sup[:, :2048]
    idx, d2 = jax.block_until_ready(knn_pallas(sup, q, 24))
    set_knn_backend("exact")
    try:
        oidx, _ = _knn_jnp(sup, q, 24)
    finally:
        set_knn_backend("auto")
    assert _recall(idx, oidx) >= 0.995


def test_ball_query_compiled_membership(rng):
    sup = _clouds(rng, 2, 24000, scale=2.0)
    q = sup[:, :4096]
    radius, k = 0.1, 32
    idx = np.asarray(ball_query_pallas(sup, q, radius, k))
    sup_np, q_np = np.asarray(sup), np.asarray(q)
    set_knn_backend("exact")
    try:
        oracle = np.asarray(_ball_query_jnp(sup, q, radius, k))
    finally:
        set_knn_backend("auto")
    rs = np.random.RandomState(2)
    missed = total_small = 0
    for b in range(2):
        for i in rs.choice(4096, 128, replace=False):
            d = ((q_np[b, i] - sup_np[b]) ** 2).sum(-1)
            # fp32 matmul-form d² in the kernels can flip points sitting ON
            # the radius boundary vs this numpy fp64 truth — use bands
            strict = set(np.where(d < radius ** 2 * (1 - 1e-4))[0].tolist())
            loose = set(np.where(d < radius ** 2 * (1 + 1e-4))[0].tolist())
            got = idx[b, i]
            ogot = oracle[b, i]
            if len(loose) == 0:
                assert (got == 0).all() and (ogot == 0).all()
                continue
            # every returned slot must be a true (loose) in-ball point
            assert set(got.tolist()) <= loose
            if len(loose) <= k:
                # ≤k members: the exact backend returns the full set; the
                # Pallas kernel's best-2-per-bin harvest may rarely drop a
                # point whose bin held 3+ in-ball members (the random-subset
                # deviation, docs/DEVIATIONS.md §3)
                assert strict <= set(ogot.tolist())
                total_small += len(strict)
                missed += len(strict - set(got.tolist()))
    assert total_small == 0 or missed / total_small <= 0.02, \
        f"missed {missed}/{total_small} in-ball points"


def test_ball_query_big_pruned_compiled(rng):
    """Compiled slab-sorted pruned large-N ball query (the whole-room rung
    configuration, N > _BIG_N): soundness (every slot in-ball) + recall at
    least matching the unpruned uniform-permutation layout."""
    import amcontrast3d_tpu.ops.knn_pallas as KP

    sup = _clouds(rng, 1, 98304, scale=6.0)
    q = sup[:, ::4][:, :16384]
    radius, k = 0.15, 32
    on = np.asarray(KP.ball_query_pallas(sup, q, radius, k))
    import os
    os.environ["AMC3D_BALL_PRUNED"] = "off"
    KP.ball_query_pallas._clear_cache()
    try:
        off = np.asarray(KP.ball_query_pallas(sup, q, radius, k))
    finally:
        del os.environ["AMC3D_BALL_PRUNED"]
        KP.ball_query_pallas._clear_cache()

    sup_np, q_np = np.asarray(sup)[0], np.asarray(q)[0]
    rs = np.random.RandomState(3)
    rec = {"on": [0, 0], "off": [0, 0]}
    for i in rs.choice(q_np.shape[0], 256, replace=False):
        d = ((q_np[i] - sup_np) ** 2).sum(-1)
        loose = set(np.where(d < radius ** 2 * (1 + 1e-4))[0].tolist())
        strict = np.where(d < radius ** 2 * (1 - 1e-4))[0]
        if len(loose) == 0:
            assert (on[0, i] == 0).all() and (off[0, i] == 0).all()
            continue
        for name, res in (("on", on), ("off", off)):
            gset = set(res[0, i].tolist())
            assert gset <= loose, f"{name}: {gset - loose} out of ball"
            rec[name][0] += len(gset & set(strict.tolist()))
            rec[name][1] += min(len(strict), k)
    r_on = rec["on"][0] / max(rec["on"][1], 1)
    r_off = rec["off"][0] / max(rec["off"][1], 1)
    assert r_on >= 0.97 and r_on >= r_off - 0.02, \
        f"pruned recall {r_on:.4f} vs unpruned {r_off:.4f}"


def _np_fps(pts, npoint):
    """fp64 numpy FPS oracle — min-index tie-break like the kernels."""
    pts = pts.astype(np.float64)
    mind = np.full(pts.shape[0], np.inf)
    sel = [0]
    for _ in range(npoint - 1):
        d = ((pts - pts[sel[-1]]) ** 2).sum(-1)
        mind = np.minimum(mind, d)
        sel.append(int(np.argmax(mind)))
    return np.array(sel)


def test_fps_compiled_valid_and_equivalent(rng):
    """Compiled FPS vs the fp64 numpy oracle — EXACT match.  (The round-3
    "bit-equality breaks on FMA scheduling" lore was a misdiagnosis: the
    real defect was the (1,1) int32 aliased carry ref reading garbage on
    entry, which re-seeded every call's FPS from the origin.  With the
    (8,128) f32 coord-carry tile, device picks match numpy exactly at
    these shapes.)"""
    xyz = _clouds(rng, 4, 8192)
    got = np.asarray(jax.block_until_ready(
        furthest_point_sample_pallas(xyz, 2048)))
    xyz_np = np.asarray(xyz)
    for b in range(4):
        ref = _np_fps(xyz_np[b], 2048)
        assert len(set(got[b].tolist())) == 2048, "repeated FPS picks"
        if (got[b] == ref).all():
            continue
        # At 25% sampling density late picks can hit genuine fp32-vs-fp64
        # near-ties; a single flip cascades.  Accept ONLY if the first
        # divergent pick is a provable near-tie (rel gap < 1e-5 under the
        # fp64 prefix state) — the origin-seeding bug this test caught had
        # rel gap ~0.7 at pick 1 and fails this hard.
        i = int(np.argmax(got[b] != ref))
        assert i > 64, f"b={b}: early divergence at pick {i}"
        pts = xyz_np[b].astype(np.float64)
        mind = np.full(len(pts), np.inf)
        for s in ref[:i]:
            mind = np.minimum(mind, ((pts - pts[s]) ** 2).sum(-1))
        rel = abs(mind[got[b][i]] - mind[ref[i]]) / max(mind[ref[i]], 1e-30)
        assert rel < 1e-5, f"b={b} pick {i}: rel gap {rel:.2e} not a tie"


def test_fps_composite_gather(rng):
    """Regression: a downstream gather fused across the multi-call aliased
    B==1 FPS chain corrupted the per-call index outputs (INT32_MAX rows /
    NaN gathered positions at the 442k eval rung) — the exact composite
    every SA stage runs.  ``_pin`` (optimization_barrier on the
    concatenated output) must keep the composite bit-identical to FPS in
    isolation for BOTH B==1 kernels.  The ops budget is shrunk so the
    multi-call split triggers at test size."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    from amcontrast3d_tpu.ops.group import gather_points

    N, npoint = 65536, 16384
    xyz = _clouds(rng, 1, N, scale=8.0)
    old_budget, old_mode = FP._B1_OPS_BUDGET, FP._PRUNED
    try:
        FP._B1_OPS_BUDGET = 2e8   # -> 4 chained calls at this size
        for mode in ("off", "on"):
            FP.set_fps_pruned(mode)
            # the dispatch mode is read at trace time -> bust the jit cache
            furthest_point_sample_pallas.clear_cache()

            def composite(p):
                idx = furthest_point_sample_pallas(p, npoint)
                return idx, gather_points(p, idx)

            idx_c, newp = jax.block_until_ready(jax.jit(composite)(xyz))
            idx_i = jax.block_until_ready(
                furthest_point_sample_pallas(xyz, npoint))
            idx_c, idx_i = np.asarray(idx_c)[0], np.asarray(idx_i)[0]
            assert ((idx_c >= 0) & (idx_c < N)).all(), \
                f"mode={mode}: oob indices in composite"
            assert (idx_c == idx_i).all(), \
                f"mode={mode}: {int((idx_c != idx_i).sum())} picks differ " \
                "between composite and isolation"
            assert len(set(idx_c.tolist())) == npoint
            assert np.isfinite(np.asarray(newp)).all()
    finally:
        FP._B1_OPS_BUDGET = old_budget
        FP.set_fps_pruned(old_mode)
        furthest_point_sample_pallas.clear_cache()


def test_fps_pruned_batched_compiled_equivalent(rng):
    """Chunk-pruned B>1 (training-shape) FPS on device: pick-for-pick
    equality with the dense batched kernel at the flagship stage-1 shape
    (B=4, 24000 -> 6000; the batched kd-sort + per-cloud pruned core must
    preserve the dense kernel's lowest-original-index tie order)."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    B, N, npoint = 4, 24000, 6000
    xyz = _clouds(rng, B, N, scale=8.0)
    got = np.asarray(jax.block_until_ready(jax.jit(
        lambda p: FP._fps_pruned_batched(p, npoint, False))(xyz)))
    dense = np.asarray(jax.block_until_ready(
        furthest_point_sample_pallas(xyz, npoint)))
    for b in range(B):
        assert got[b, 0] == 0
        assert len(set(got[b].tolist())) == npoint, "repeated FPS picks"
        assert (got[b] == dense[b]).all(), \
            f"b={b}: {int((got[b] != dense[b]).sum())} picks differ"


def test_fps_pruned_compiled_valid_and_equivalent(rng):
    """Chunk-pruned B==1 FPS on device: exact pick-for-pick equality with
    the DENSE compiled kernel at an eval-ladder-like size (pruning is
    provably exact; both kernels tie-break by lowest original index)."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    N, npoint = 262144, 4096
    xyz = _clouds(rng, 1, N, scale=8.0)
    planes = xyz.transpose(2, 0, 1)
    got = np.asarray(jax.block_until_ready(FP._fps_b1_pruned(
        planes[0], planes[1], planes[2], N, npoint, False)))
    dense = np.asarray(jax.block_until_ready(FP._fps_b1(
        planes[0], planes[1], planes[2], N, npoint, False)))
    assert got[0, 0] == 0
    assert len(set(got[0].tolist())) == npoint, "repeated FPS picks"
    assert (got[0] == dense[0]).all(), \
        f"{int((got[0] != dense[0]).sum())} picks differ from dense"
