"""Golden tests for the point ops against numpy oracles.

Mirrors the reference's kernel-level test pattern (gradcheck / analytic
golden values, ``cpp/chamfer_dist/test.py``, ``cpp/emd/test_emd_loss.py``)
with explicit oracles for the semantics pinned down in the CUDA kernels.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu import ops


def np_knn(support, query, k):
    """Oracle: exact kNN sorted ascending, ties by lowest index."""
    d = ((query[:, :, None, :] - support[:, None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1, kind="stable")[..., :k]
    dist = np.take_along_axis(d, idx, axis=-1)
    return idx, dist


def np_ball_query(support, query, radius, k):
    """Oracle for ball_query_gpu.cu: first k in-radius in index order,
    padded with the first hit (0 if no hit)."""
    B, M, _ = query.shape
    N = support.shape[1]
    out = np.zeros((B, M, k), dtype=np.int32)
    for b in range(B):
        for m in range(M):
            cnt = 0
            for n in range(N):
                d2 = ((query[b, m] - support[b, n]) ** 2).sum()
                if d2 < radius * radius:
                    if cnt == 0:
                        out[b, m, :] = n
                    out[b, m, cnt] = n
                    cnt += 1
                    if cnt >= k:
                        break
    return out


def np_fps(xyz, npoint):
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int64)
    for b in range(B):
        mind = np.full(N, 1e10)
        last = 0
        for j in range(1, npoint):
            d = ((xyz[b] - xyz[b, last]) ** 2).sum(-1)
            mind = np.minimum(mind, d)
            last = int(np.argmax(mind))
            out[b, j] = last
    return out


class TestKNN:
    def test_matches_oracle(self, rng):
        sup = rng.randn(2, 64, 3).astype(np.float32)
        q = rng.randn(2, 33, 3).astype(np.float32)
        idx, d2 = ops.knn(jnp.array(sup), jnp.array(q), 5, tile=16)
        oidx, od = np_knn(sup, q, 5)
        np.testing.assert_array_equal(np.asarray(idx), oidx)
        np.testing.assert_allclose(np.asarray(d2), od, rtol=1e-4, atol=1e-4)

    def test_self_first(self, rng):
        p = rng.randn(1, 40, 3).astype(np.float32)
        idx, d2 = ops.knn(jnp.array(p), jnp.array(p), 4, tile=64)
        np.testing.assert_array_equal(np.asarray(idx[0, :, 0]), np.arange(40))
        assert np.allclose(np.asarray(d2[..., 0]), 0.0, atol=1e-5)


class TestBallQuery:
    def test_matches_cuda_semantics(self, rng):
        sup = rng.rand(2, 50, 3).astype(np.float32)
        q = sup[:, ::2].copy()
        idx = ops.ball_query(jnp.array(sup), jnp.array(q), 0.3, 8, tile=16)
        oracle = np_ball_query(sup, q, 0.3, 8)
        np.testing.assert_array_equal(np.asarray(idx), oracle)

    def test_empty_ball_returns_zero(self):
        sup = np.array([[[10.0, 10.0, 10.0], [0, 0, 0]]], dtype=np.float32)
        q = np.array([[[-10.0, -10.0, -10.0]]], dtype=np.float32)
        idx = ops.ball_query(jnp.array(sup), jnp.array(q), 0.1, 4)
        np.testing.assert_array_equal(np.asarray(idx), 0)


class TestFPS:
    def test_matches_oracle(self, rng):
        xyz = rng.randn(3, 60, 3).astype(np.float32)
        idx = ops.furthest_point_sample(jnp.array(xyz), 16)
        oracle = np_fps(xyz, 16)
        np.testing.assert_array_equal(np.asarray(idx), oracle)

    def test_first_index_zero(self, rng):
        xyz = rng.randn(2, 30, 3).astype(np.float32)
        idx = ops.furthest_point_sample(jnp.array(xyz), 8)
        assert np.all(np.asarray(idx[:, 0]) == 0)

    def test_unique_indices(self, rng):
        xyz = rng.randn(1, 100, 3).astype(np.float32)
        idx = np.asarray(ops.furthest_point_sample(jnp.array(xyz), 25))[0]
        assert len(set(idx.tolist())) == 25


class TestGrouping:
    def test_gather_group(self, rng):
        x = rng.randn(2, 20, 6).astype(np.float32)
        idx = rng.randint(0, 20, (2, 7)).astype(np.int32)
        out = np.asarray(ops.gather_points(jnp.array(x), jnp.array(idx)))
        for b in range(2):
            np.testing.assert_array_equal(out[b], x[b, idx[b]])
        gidx = rng.randint(0, 20, (2, 7, 4)).astype(np.int32)
        gout = np.asarray(ops.group_points(jnp.array(x), jnp.array(gidx)))
        for b in range(2):
            np.testing.assert_array_equal(gout[b], x[b][gidx[b]])

    def test_group_backward_is_scatter_add(self, rng):
        """Autodiff of group_points == the CUDA atomicAdd backward."""
        x = rng.randn(1, 10, 4).astype(np.float32)
        idx = np.array([[[0, 0, 3], [3, 5, 0]]], dtype=np.int32)

        def f(x):
            return jnp.sum(ops.group_points(x, jnp.array(idx)) * 2.0)

        g = np.asarray(jax.grad(f)(jnp.array(x)))
        expected = np.zeros_like(x)
        for m in range(2):
            for k in range(3):
                expected[0, idx[0, m, k]] += 2.0
        np.testing.assert_allclose(g, expected, atol=1e-6)

    def test_group_sorted_bwd_matches_scatter(self, rng, monkeypatch):
        """AMC3D_GROUP_BWD=sorted: value bit-equal, grad == scatter-add."""
        x = rng.randn(3, 40, 8).astype(np.float32)
        idx = rng.randint(0, 40, (3, 16, 6)).astype(np.int32)
        ct = rng.randn(3, 16, 6, 8).astype(np.float32)

        def run():
            def f(x):
                return jnp.sum(ops.group_points(x, jnp.array(idx))
                               * jnp.array(ct))
            return (np.asarray(f(jnp.array(x))),
                    np.asarray(jax.grad(f)(jnp.array(x))))

        v0, g0 = run()
        monkeypatch.setenv("AMC3D_GROUP_BWD", "sorted")
        v1, g1 = run()
        np.testing.assert_array_equal(v0, v1)
        np.testing.assert_allclose(g0, g1, rtol=1e-5, atol=1e-5)


class TestInterpolate:
    def test_three_interpolation_exact_at_source(self, rng):
        """Interpolating onto the source points reproduces the features."""
        p = rng.randn(2, 12, 3).astype(np.float32)
        f = rng.randn(2, 12, 5).astype(np.float32)
        out = np.asarray(ops.three_interpolation(jnp.array(p), jnp.array(p), jnp.array(f)))
        np.testing.assert_allclose(out, f, rtol=1e-3, atol=1e-3)

    def test_weights_inverse_distance(self, rng):
        pto = rng.randn(1, 9, 3).astype(np.float32)
        pfrom = rng.randn(1, 6, 3).astype(np.float32)
        f = rng.randn(1, 6, 2).astype(np.float32)
        out = np.asarray(ops.three_interpolation(jnp.array(pto), jnp.array(pfrom), jnp.array(f)))
        d = np.sqrt(((pto[:, :, None] - pfrom[:, None]) ** 2).sum(-1))
        idx = np.argsort(d, -1)[..., :3]
        dd = np.take_along_axis(d, idx, -1)
        w = 1.0 / (dd + 1e-8)
        w = w / w.sum(-1, keepdims=True)
        expected = (f[0][idx[0]] * w[0][..., None]).sum(-2)
        np.testing.assert_allclose(out[0], expected, rtol=1e-3, atol=1e-3)


class TestAmbiguity:
    def test_hard_values(self):
        """all-same → 0, all-diff → 1 (ambiguity.py:13-15)."""
        K = 6
        posmask = jnp.array([[True] * K, [False] * K, [True] * 3 + [False] * 3])
        dd = jnp.ones((3, K))
        a = np.asarray(ops.ambiguity_function(posmask, dd))
        assert a[0] == 0.0
        assert a[1] == 1.0
        assert 0.0 < a[2] < 1.0

    def test_method2_formula(self):
        posmask = jnp.array([[True, False, True, False]])
        dd = jnp.array([[1.0, 2.0, 3.0, 4.0]])
        # needs a point with full count to set maxc = 4
        posmask = jnp.concatenate([posmask, jnp.ones((1, 4), bool)])
        dd = jnp.concatenate([dd, jnp.ones((1, 4))])
        a = np.asarray(ops.ambiguity_function(posmask, dd, "Method2", 0.04))
        cc = 2 / (1 + 3) - 2 / (2 + 4)
        expected = 1 / (1 + np.exp(0.04 * cc))
        np.testing.assert_allclose(a[0], expected, rtol=1e-5)

    def test_histogram_sums_100(self, rng):
        a = jnp.array(rng.rand(100).astype(np.float32))
        h = np.asarray(ops.ambiguity_histogram(a, nu=0.5))
        np.testing.assert_allclose(h.sum(), 100.0, atol=0.1)


class TestChamferEMD:
    def test_chamfer_zero_for_identical(self, rng):
        p = jnp.array(rng.randn(2, 32, 3).astype(np.float32))
        assert float(ops.chamfer_distance_l2(p, p)) < 1e-6

    def test_chamfer_analytic(self):
        a = jnp.array([[[0.0, 0, 0], [1, 0, 0]]])
        b = jnp.array([[[0.0, 0, 0], [3, 0, 0]]])
        # d1: [0, 4]→wait min over b: [0, min(1,4)=... ] compute: p=(1,0,0): dists 1, 4 → 1
        val = float(ops.chamfer_distance_l2(a, b))
        # d1 = mean([0, 1]) = 0.5 ; d2 = mean([0, 4]) = 2.0
        np.testing.assert_allclose(val, 2.5, rtol=1e-5)

    def test_emd_2point_golden(self):
        """Golden case in the spirit of cpp/emd/test_emd_loss.py."""
        p1 = jnp.array([[[0.0, 0, 0], [1, 0, 0]]])
        p2 = jnp.array([[[0.0, 0.5, 0], [1, 0.5, 0]]])
        val = float(ops.earth_mover_distance(p1, p2))
        # perfect match cost: 2 * 0.25 / n(=2) = 0.25
        np.testing.assert_allclose(val, 0.25, rtol=1e-2)

    def test_emd_grad_finite(self, rng):
        p1 = jnp.array(rng.randn(1, 8, 3).astype(np.float32))
        p2 = jnp.array(rng.randn(1, 8, 3).astype(np.float32))
        g = jax.grad(lambda a: ops.earth_mover_distance(a, p2))(p1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestPointopsExtra:
    def test_subtraction(self, rng):
        from amcontrast3d_tpu.ops import subtraction
        f1 = jnp.array(rng.randn(10, 4).astype(np.float32))
        f2 = jnp.array(rng.randn(10, 4).astype(np.float32))
        idx = jnp.array(rng.randint(0, 10, (10, 3)))
        out = np.asarray(subtraction(f1, f2, idx))
        for i in range(10):
            for k in range(3):
                np.testing.assert_allclose(
                    out[i, k], np.asarray(f1)[i] - np.asarray(f2)[int(idx[i, k])],
                    rtol=1e-6)

    def test_aggregation_channel_share(self, rng):
        from amcontrast3d_tpu.ops import aggregation
        inp = jnp.array(rng.randn(8, 6).astype(np.float32))
        pos = jnp.array(rng.randn(8, 4, 6).astype(np.float32))
        w = jnp.array(rng.randn(8, 4, 2).astype(np.float32))  # share=3
        idx = jnp.array(rng.randint(0, 8, (8, 4)))
        out = np.asarray(aggregation(inp, pos, w, idx))
        i, c = 2, 4  # channel 4 → weight column 4//3 = 1
        expected = sum((np.asarray(inp)[int(idx[i, k]), c] + np.asarray(pos)[i, k, c])
                       * np.asarray(w)[i, k, 1] for k in range(4))
        np.testing.assert_allclose(out[i, c], expected, rtol=1e-5)

    def test_interpolation_flat(self, rng):
        from amcontrast3d_tpu.ops import interpolation
        xyz = jnp.array(rng.rand(20, 3).astype(np.float32))
        feat = jnp.array(rng.randn(20, 5).astype(np.float32))
        out = np.asarray(interpolation(xyz, xyz, feat, k=3))
        np.testing.assert_allclose(out, np.asarray(feat), rtol=1e-3, atol=1e-3)
