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
    """Kernel-logic equivalence at fp32 matmul precision (tight), plus the
    documented bf16 default-precision envelope (loose)."""
    p = jnp.asarray(rng.rand(2, 4096, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(2, 4096, 64).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 13, (2, 4096)).astype(np.int32))
    labels = one_hot_labels(y, 13, None)
    args_hi = dict(ARGS, fused_precision="highest")

    set_knn_backend("exact")  # same neighbor sets for both paths
    try:
        def loss_fused(f_):
            return C.point_contrast_margin_fused(p, f_, labels, args_hi)[0]

        def loss_bf16(f_):
            return C.point_contrast_margin_fused(p, f_, labels, ARGS)[0]

        def loss_xla(f_):
            C.set_fused_contrast("off")
            try:
                return C.point_contrast_margin(p, f_, labels, ARGS)[0]
            finally:
                C.set_fused_contrast("auto")

        lf, gf = jax.jit(jax.value_and_grad(loss_fused))(f)
        lb, gb = jax.jit(jax.value_and_grad(loss_bf16))(f)
        lx, gx = jax.jit(jax.value_and_grad(loss_xla))(f)
    finally:
        set_knn_backend("auto")

    gf, gb, gx = np.asarray(gf), np.asarray(gb), np.asarray(gx)

    def agree(a, b):
        """Gradient agreement robust to tiny absolute scales: direction
        (cosine) and magnitude (norm ratio)."""
        na, nb_ = np.linalg.norm(a), np.linalg.norm(b)
        cos = float((a * b).sum() / (na * nb_ + 1e-30))
        return cos, float(na / (nb_ + 1e-30))

    # fp32 similarities: tight equivalence proves the kernel logic
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4, atol=1e-5)
    cos, ratio = agree(gf, gx)
    assert cos >= 0.999 and 0.99 <= ratio <= 1.01, (cos, ratio)
    # bf16 default: the documented envelope (DEVIATIONS.md §11)
    np.testing.assert_allclose(float(lb), float(lx), rtol=1e-3, atol=1e-4)
    cos, ratio = agree(gb, gx)
    assert cos >= 0.99 and 0.95 <= ratio <= 1.05, (cos, ratio)


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
    # the threshold cushion may admit one near-tied extra neighbor on a
    # handful of points (docs/DEVIATIONS.md §11)
    diff = np.abs(np.asarray(red[..., 4]) -
                  np.asarray(jnp.sum(posmask, -1).astype(jnp.float32)))
    assert diff.max() <= 1
    assert (diff > 0).mean() <= 0.01


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


def test_fused_interp_compiled(rng):
    """Compiled 3-NN interpolation kernel vs the exact gather path."""
    from amcontrast3d_tpu.ops.interpolate import three_interpolate, three_nn
    from amcontrast3d_tpu.ops.interpolate_pallas import (
        three_interpolation_fused)

    p1 = jnp.asarray(rng.rand(2, 24000, 3).astype(np.float32) * 4)
    p2 = jnp.asarray(rng.rand(2, 6000, 3).astype(np.float32) * 4)
    f2 = jnp.asarray(rng.randn(2, 6000, 64).astype(np.float32))
    got = np.asarray(three_interpolation_fused(p1, p2, f2, False))
    set_knn_backend("exact")
    try:
        dist, idx = three_nn(p1, p2)
    finally:
        set_knn_backend("auto")
    rec = 1.0 / (dist + 1e-8)
    w = rec / jnp.sum(rec, 2, keepdims=True)
    want = np.asarray(three_interpolate(f2, idx, w))
    close = np.isclose(got, want, rtol=1e-3, atol=1e-3)
    assert close.mean() >= 0.999, f"{1 - close.mean():.5f} mismatched"


def test_fused_interp_big_pruned_compiled(rng):
    """Compiled pruned large-support interp path (seed/scan 3rd-NN kernels
    + chunk-skipped accumulation — the whole-room ladder configuration) vs
    the resident kernel at a shape where both compile."""
    import amcontrast3d_tpu.ops.interpolate_pallas as IP

    p1 = jnp.asarray(rng.rand(1, 98304, 3).astype(np.float32) * 8)
    p2 = jnp.asarray(rng.rand(1, 24576, 3).astype(np.float32) * 8)
    f2 = jnp.asarray(rng.randn(1, 24576, 32).astype(np.float32))
    res = np.asarray(IP.three_interpolation_fused(p1, p2, f2, False))
    orig = IP._SUP_VMEM_BUDGET
    IP._SUP_VMEM_BUDGET = 1
    try:
        big = np.asarray(IP.three_interpolation_fused(p1, p2, f2, False))
    finally:
        IP._SUP_VMEM_BUDGET = orig
    rows = np.isclose(big, res, rtol=1e-4, atol=1e-4).all(-1)
    assert rows.mean() >= 0.995, f"{1 - rows.mean():.4f} rows differ"


def test_fused_interp_bwd_chunked_compiled(rng):
    """Compiled query-chunked interp backward (the ScanNet-recipe fp0 shape
    class: qbuf beyond the 32 MB residency gate) vs the resident kernel at a
    shape where both compile."""
    import amcontrast3d_tpu.ops.interpolate_pallas as IP

    p1 = jnp.asarray(rng.rand(1, 24000, 3).astype(np.float32) * 4)
    p2 = jnp.asarray(rng.rand(1, 6000, 3).astype(np.float32) * 4)
    f2 = jnp.asarray(rng.randn(1, 6000, 64).astype(np.float32))
    tgt = jnp.asarray(rng.randn(1, 24000, 64).astype(np.float32))

    def loss(f_):
        return jnp.sum((IP.three_interpolation_fused(p1, p2, f_, False)
                        - tgt) ** 2)

    g_res = np.asarray(jax.grad(loss)(f2))
    orig_budget, orig_qb = IP._QBUF_VMEM_BUDGET, IP._QB
    IP._QBUF_VMEM_BUDGET, IP._QB = 1, 4096
    try:
        g_chunk = np.asarray(jax.grad(loss)(f2))
    finally:
        IP._QBUF_VMEM_BUDGET, IP._QB = orig_budget, orig_qb
    np.testing.assert_allclose(g_chunk, g_res, rtol=1e-5, atol=1e-5)


def test_label_vote_compiled(rng):
    """Compiled majority-vote kernel vs argmax of the soft subscene labels."""
    from amcontrast3d_tpu.loss.aef import one_hot_labels, subscene_labels
    from amcontrast3d_tpu.ops import label_vote

    p0 = jnp.asarray(rng.rand(2, 24000, 3).astype(np.float32) * 4)
    y0 = jnp.asarray(rng.randint(0, 13, (2, 24000)).astype(np.int32))
    labels0 = one_hot_labels(y0, 13, None)
    pq = p0[:, ::4]
    set_knn_backend("exact")
    try:
        want = np.asarray(jnp.argmax(subscene_labels(labels0, p0, pq, 1), -1))
    finally:
        set_knn_backend("auto")
    got = np.asarray(label_vote(p0, y0, pq, 4, 13, interpret=False))
    match = (got == want).mean()
    # near-ties at the 4th distance may flip a vote on a handful of points
    assert match >= 0.999, f"vote mismatch rate {1 - match:.5f}"


def test_dual_masks_cross_compiled(rng):
    """Compiled fused DualMasks CrossMask vs the exact-kNN XLA path at a
    flagship-like stage shape (tie-free ambiguity -> paths must agree on
    all but threshold-superset points)."""
    from amcontrast3d_tpu.models.refine import dual_masks
    from amcontrast3d_tpu.loss import contrast as CC

    B, N, Cdim = 2, 24000, 64
    p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(B, N, Cdim).astype(np.float32))
    a = jnp.asarray(rng.rand(B, N).astype(np.float32))

    set_knn_backend("exact")
    CC.set_fused_contrast("off")
    try:
        want_f, want_rate = jax.jit(
            lambda: dual_masks(p, f, a, 12, "MIN", 0.7, 1.0, 0.5))()
        want_f = np.asarray(want_f)
    finally:
        set_knn_backend("auto")
        CC.set_fused_contrast("auto")

    got_f, got_rate = jax.jit(
        lambda: dual_masks(p, f, a, 12, "MIN", 0.7, 1.0, 0.5))()
    got_f = np.asarray(got_f)
    assert abs(float(got_rate) - float(want_rate)) < 1e-4
    # row-level agreement: a point differs only if its threshold set was a
    # superset AND the extra member had the smaller ambiguity
    row_close = np.isclose(got_f, want_f, rtol=1e-4, atol=1e-4).all(-1)
    assert row_close.mean() >= 0.995, f"{1 - row_close.mean():.5f} rows differ"
