"""Compiled fused-contrast kernel vs the XLA gather path on real TPU.

tests/test_contrast_pallas.py proves the same equivalence in interpret mode;
this tier catches Mosaic lowering regressions in the compiled kernels (the
dense-matmul forward and the two matmul-VJP kernels)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.loss import contrast as C
from amcontrast3d_tpu.loss.aef import one_hot_labels
from amcontrast3d_tpu.ops.knn import set_knn_backend

pytestmark = pytest.mark.tpu

ARGS = dict(nsample=24, ccbeta=0.04, cctype="Method2", temperature=0.3,
            supervisedCL="Method1", db="-m", margin="adaptive", mu=-1, nu=0.5)


def test_fused_loss_and_grad_compiled(rng):
    p = jnp.asarray(rng.rand(2, 4096, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(2, 4096, 64).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 13, (2, 4096)).astype(np.int32))
    labels = one_hot_labels(y, 13, None)

    set_knn_backend("exact")  # same neighbor sets for both paths
    try:
        def loss_fused(f_):
            return C.point_contrast_margin_fused(p, f_, labels, ARGS)[0]

        def loss_xla(f_):
            C.set_fused_contrast("off")
            try:
                return C.point_contrast_margin(p, f_, labels, ARGS)[0]
            finally:
                C.set_fused_contrast("auto")

        lf, gf = jax.jit(jax.value_and_grad(loss_fused))(f)
        lx, gx = jax.jit(jax.value_and_grad(loss_xla))(f)
    finally:
        set_knn_backend("auto")

    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4, atol=1e-5)
    gf, gx = np.asarray(gf), np.asarray(gx)
    scale = np.abs(gx).max()
    assert np.abs(gf - gx).max() <= 5e-4 * scale + 1e-7


def test_fused_multichunk_compiled(rng):
    """Stage-0 sized support (N > CS) exercises the chunk loop compiled."""
    from amcontrast3d_tpu.ops import contrast_reductions
    from amcontrast3d_tpu.loss.aef import stage_neighborhood
    from amcontrast3d_tpu.ops import group_points

    p = jnp.asarray(rng.rand(1, 6000, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(1, 6000, 32).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 13, (1, 6000)).astype(np.int32))
    labels = one_hot_labels(y, 13, None)
    set_knn_backend("exact")
    try:
        idx, posmask, dd = stage_neighborhood(p, labels, 24)
    finally:
        set_knn_backend("auto")
    neigh = group_points(p, idx)
    kth = jnp.max(jnp.sum((p[:, :, None, :] - neigh) ** 2, -1), -1) * (1 + 1e-5)
    red = contrast_reductions(p, f, y.astype(jnp.float32), kth, 1.0, False,
                              False)
    np.testing.assert_allclose(
        np.asarray(red[..., 4]),
        np.asarray(jnp.sum(posmask, -1).astype(jnp.float32)), atol=0)


def test_selfk_neighborhood_counts_compiled(rng):
    """In-kernel selection on device: every point's threshold set contains
    the full k-NN set (superset property) and ≥99% match exactly."""
    from amcontrast3d_tpu.ops import contrast_reductions_selfk

    p = jnp.asarray(rng.rand(2, 24000, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(2, 24000, 16).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 13, (2, 24000)).astype(np.int32))
    red = np.asarray(contrast_reductions_selfk(
        p, f, y.astype(jnp.float32), 24, 1.0, False, False))
    counts = red[..., 4] + red[..., 5]
    assert counts.min() >= 23, "threshold set lost a true neighbor"
    assert (counts == 23).mean() >= 0.99, "too many superset overflows"
    assert counts.max() <= 28, "threshold set far too large"
