"""Fused Pallas kNN / ball-query kernels vs oracles (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.ops.knn_pallas import ball_query_pallas, knn_pallas


def test_knn_pallas_recall_and_order(rng):
    sup = jnp.asarray(rng.rand(2, 3000, 3).astype(np.float32))
    q = jnp.asarray(rng.rand(2, 300, 3).astype(np.float32))
    idx, d2 = knn_pallas(sup, q, 8, interpret=True)
    d = np.asarray(((np.asarray(q)[:, :, None, :] -
                     np.asarray(sup)[:, None, :, :]) ** 2).sum(-1))
    oidx = np.argsort(d, -1)[:, :, :8]
    recall = np.mean([len(set(a) & set(o)) / 8
                      for A, O in zip(np.asarray(idx), oidx)
                      for a, o in zip(A, O)])
    assert recall > 0.97
    assert np.all(np.diff(np.asarray(d2), axis=-1) >= -1e-6)  # ascending


def test_knn_pallas_self_first(rng):
    p = jnp.asarray(rng.rand(1, 4096, 3).astype(np.float32))
    idx, d2 = knn_pallas(p, p, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx)[0, :, 0], np.arange(4096))
    assert np.allclose(np.asarray(d2)[..., 0], 0.0, atol=1e-5)


def test_ball_query_pallas_in_ball(rng):
    sup = jnp.asarray(rng.rand(1, 3000, 3).astype(np.float32))
    q = sup[:, :128]
    idx = np.asarray(ball_query_pallas(sup, q, 0.2, 8, interpret=True))
    d = np.asarray(((np.asarray(q)[:, :, None, :] -
                     np.asarray(sup)[:, None, :, :]) ** 2).sum(-1))[0]
    for i in range(128):
        got = idx[0, i]
        # self is always in-ball, so all slots must be valid in-ball points
        assert (d[i][got] < 0.04 + 1e-5).all()


def test_ball_query_pallas_empty_ball():
    sup = np.zeros((1, 4096, 3), np.float32)
    sup[0, :, 0] = np.linspace(0, 100, 4096)
    q = np.full((1, 8, 3), -50.0, np.float32)
    idx = np.asarray(ball_query_pallas(jnp.asarray(sup), jnp.asarray(q),
                                       0.1, 4, interpret=True))
    assert np.all(idx == 0)  # reference zero-init semantics
