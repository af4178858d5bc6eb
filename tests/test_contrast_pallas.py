"""Fused contrast kernel (ops/contrast_pallas.py) vs the XLA gather path.

Both compute the same math (MarginContrast.py:220-259); the fused kernel
replaces the neighbor index gathers with a k-th-distance threshold and the
(B,N,K,C) feature gather with dense tiled matmuls.  On CPU the kernel runs
in interpret mode and the kNN backend is exact, so the two paths must agree
to float tolerance (same neighbor sets, no ties with random data).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.loss import contrast as C
from amcontrast3d_tpu.loss.aef import one_hot_labels, stage_neighborhood
from amcontrast3d_tpu.ops import contrast_reductions, group_points

ARGS = dict(nsample=12, ccbeta=0.04, cctype="Method2", temperature=0.3,
            supervisedCL="Method1", db="-m", margin="adaptive",
            mu=-1, nu=0.5)


def _data(rng, b=2, n=300, c=32, ncls=5):
    p = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    y = jnp.asarray(rng.randint(0, ncls, (b, n)).astype(np.int32))
    labels = one_hot_labels(y, ncls, None)
    return p, f, y, labels


def _kth(p, idx):
    """Threshold in the kernel's own (q−s)² arithmetic (see
    point_contrast_margin_fused) — the kNN's matmul-form d² rounds
    differently and would flip the k-th member."""
    neigh = group_points(p, idx)
    return jnp.max(jnp.sum((p[:, :, None, :] - neigh) ** 2, -1), -1) * (1 + 1e-5)


def test_reductions_match_gather_path(rng):
    p, f, y, labels = _data(rng)
    idx, posmask, dd = stage_neighborhood(p, labels, ARGS["nsample"])
    kth = _kth(p, idx)

    fsim = f / jnp.maximum(
        jnp.sqrt(jnp.sum(f * f, -1, keepdims=True)), 1e-8)
    red = contrast_reductions(p, fsim, y.astype(jnp.float32), kth,
                              1.0 / 0.3, False, True)

    nf = group_points(fsim, idx)
    s = jnp.sum(fsim[..., None, :] * nf, axis=-1)
    e = jnp.exp(s / 0.3)
    pm = posmask.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(red[..., 0]),
                               np.asarray(jnp.sum(e * pm, -1)),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(red[..., 1]),
                               np.asarray(jnp.sum(e * (1 - pm), -1)),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(red[..., 2]),
                               np.asarray(jnp.sum(s * pm, -1)),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(red[..., 4]),
                               np.asarray(jnp.sum(pm, -1)), atol=0)
    np.testing.assert_allclose(np.asarray(red[..., 6]),
                               np.asarray(jnp.sum(pm * dd, -1)),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(red[..., 7]),
                               np.asarray(jnp.sum((1 - pm) * dd, -1)),
                               rtol=2e-5, atol=1e-5)


def test_reductions_multichunk(rng):
    """N > CS exercises the chunked support loop."""
    p, f, y, labels = _data(rng, b=1, n=2100, c=16)
    idx, posmask, dd = stage_neighborhood(p, labels, 8)
    kth = _kth(p, idx)
    red = contrast_reductions(p, f, y.astype(jnp.float32), kth,
                              1.0, False, True)
    np.testing.assert_allclose(np.asarray(red[..., 4]),
                               np.asarray(jnp.sum(posmask, -1).astype(np.float32)),
                               atol=0)
    nf = group_points(f, idx)
    s = jnp.sum(f[..., None, :] * nf, axis=-1)
    e = jnp.exp(s)
    pm = posmask.astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(red[..., 0]),
                               np.asarray(jnp.sum(e * pm, -1)),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("dist_func", ["dist_cos", "dist_dot"])
@pytest.mark.parametrize("margin,db", [("adaptive", "-m"),
                                       ("constant", "+m"),
                                       ("learned", "-m"),
                                       ("adaptive", "none")])
def test_fused_loss_matches_xla_path(rng, dist_func, margin, db):
    p, f, y, labels = _data(rng)
    args = dict(ARGS, margin=margin, db=db)
    if dist_func == "dist_dot":
        f = f * 0.1  # keep exp(dot/T) in fp32 range

    C.set_fused_contrast("off")
    try:
        loss_ref, a_ref = C.point_contrast_margin(p, f, labels, args,
                                                  dist_func=dist_func)
    finally:
        C.set_fused_contrast("auto")
    loss_fused, a_fused = C.point_contrast_margin_fused(p, f, labels, args,
                                                        dist_func=dist_func)
    np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(loss_fused), float(loss_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("cctype", ["Method1", "Method2", "Method3"])
def test_fused_ambiguity_cctypes(rng, cctype):
    p, f, y, labels = _data(rng)
    args = dict(ARGS, cctype=cctype)
    C.set_fused_contrast("off")
    try:
        _, a_ref = C.point_contrast_margin(p, f, labels, args)
    finally:
        C.set_fused_contrast("auto")
    _, a_fused = C.point_contrast_margin_fused(p, f, labels, args)
    np.testing.assert_allclose(np.asarray(a_fused), np.asarray(a_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match(rng):
    p, f, y, labels = _data(rng)

    def loss_xla(f_):
        C.set_fused_contrast("off")
        try:
            loss, _ = C.point_contrast_margin(p, f_, labels, ARGS)
        finally:
            C.set_fused_contrast("auto")
        return loss

    def loss_fused(f_):
        loss, _ = C.point_contrast_margin_fused(p, f_, labels, ARGS)
        return loss

    g_ref = jax.grad(loss_xla)(f)
    g_fused = jax.grad(loss_fused)(f)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=1e-6)


def test_fused_grads_learned_margin(rng):
    """'learned' margin routes gradient through Spos/Sneg too."""
    p, f, y, labels = _data(rng, n=200)
    args = dict(ARGS, margin="learned")

    def loss_xla(f_):
        C.set_fused_contrast("off")
        try:
            loss, _ = C.point_contrast_margin(p, f_, labels, args)
        finally:
            C.set_fused_contrast("auto")
        return loss

    def loss_fused(f_):
        loss, _ = C.point_contrast_margin_fused(p, f_, labels, args)
        return loss

    g_ref = jax.grad(loss_xla)(f)
    g_fused = jax.grad(loss_fused)(f)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=5e-4, atol=1e-6)


def test_selfk_matches_exact_threshold(rng):
    """In-kernel value-only selection == exact-kth threshold reductions
    (small-N full-column mode is exact modulo d² ties, absent here)."""
    from amcontrast3d_tpu.ops import contrast_reductions_selfk

    p, f, y, labels = _data(rng, b=2, n=700, c=16)
    idx, posmask, dd = stage_neighborhood(p, labels, 12)
    kth = _kth(p, idx)
    ref = contrast_reductions(p, f, y.astype(jnp.float32), kth,
                              1.0, False, True)
    got = contrast_reductions_selfk(p, f, y.astype(jnp.float32), 12,
                                    1.0, False, True)
    np.testing.assert_allclose(np.asarray(got[..., 4]),
                               np.asarray(ref[..., 4]), atol=0)
    np.testing.assert_allclose(np.asarray(got[..., :8]),
                               np.asarray(ref[..., :8]), rtol=2e-5, atol=1e-5)


def test_fused_selfk_loss_and_grad(rng):
    """Approx backend routes through contrast_reductions_selfk; loss and
    grads must match the XLA gather path built on the exact kNN."""
    from amcontrast3d_tpu.ops.knn import set_knn_backend

    p, f, y, labels = _data(rng, b=2, n=600, c=24)

    def loss_xla(f_):
        C.set_fused_contrast("off")
        try:
            loss, _ = C.point_contrast_margin(p, f_, labels, ARGS)
        finally:
            C.set_fused_contrast("auto")
        return loss

    set_knn_backend("approx")  # selfk path (selection still exact on CPU
    try:                        # sizes: full-column mode)
        def loss_fused(f_):
            loss, _ = C.point_contrast_margin_fused(p, f_, labels, ARGS)
            return loss
        lf, gf = jax.value_and_grad(loss_fused)(f)
    finally:
        set_knn_backend("auto")
    lx, gx = jax.value_and_grad(loss_xla)(f)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=5e-4, atol=1e-6)


def test_label_vote_matches_subscene_argmax(rng):
    """Majority-vote kernel == argmax of the reference soft subscene labels
    (small-N full-column selection is exact; ties absent in random data)."""
    from amcontrast3d_tpu.loss.aef import subscene_labels
    from amcontrast3d_tpu.ops import label_vote
    from amcontrast3d_tpu.ops.knn import set_knn_backend

    p0 = jnp.asarray(rng.rand(2, 600, 3).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, 5, (2, 600)).astype(np.int32))
    labels0 = one_hot_labels(y0, 5, None)
    pq = p0[:, ::4][:, :150]

    set_knn_backend("exact")
    try:
        # stage 1: kr = 4
        want = jnp.argmax(subscene_labels(labels0, p0, pq, 1), -1)
    finally:
        set_knn_backend("auto")
    got = label_vote(p0, y0, pq, 4, 5, interpret=True)
    match = (np.asarray(got) == np.asarray(want)).mean()
    assert match == 1.0, f"vote mismatch rate {1 - match:.4f}"


def test_contrast_head_vote_path_matches(rng):
    """contrast_head with the vote+selfk path vs the XLA path end to end."""
    from amcontrast3d_tpu.loss.contrast import contrast_head
    from amcontrast3d_tpu.ops.knn import set_knn_backend

    b, n0 = 2, 512
    p0 = jnp.asarray(rng.rand(b, n0, 3).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, 5, (b, n0)).astype(np.int32))
    ups = []
    n = n0
    for i in range(3):
        idxs = np.arange(0, n0, 4 ** i)[: n0 // (4 ** i)]
        ups.append((p0[:, idxs],
                    jnp.asarray(rng.randn(b, len(idxs), 16).astype(np.float32))))
    args = dict(ARGS, stages_num=3)

    C.set_fused_contrast("off")
    try:
        loss_ref, ai_ref = contrast_head(ups, y0, 5, None, args)
    finally:
        C.set_fused_contrast("auto")

    C.set_fused_contrast("on")
    set_knn_backend("approx")
    try:
        loss_v, ai_v = contrast_head(ups, y0, 5, None, args)
    finally:
        set_knn_backend("auto")
        C.set_fused_contrast("auto")
    np.testing.assert_allclose(float(loss_v), float(loss_ref),
                               rtol=1e-4, atol=1e-5)
    for a, b_ in zip(ai_v, ai_ref):
        # near-ties at the k-th distance may admit one extra neighbor
        # (documented superset semantics) — a discrete ±1 mask-count flip
        # on a handful of points; everything else must agree tightly
        close = np.isclose(np.asarray(a), np.asarray(b_),
                           rtol=1e-5, atol=1e-5)
        assert close.mean() >= 0.995, f"ambiguity mismatch {1 - close.mean()}"


def test_ambiguity_head_fused_matches(rng):
    """ambiguity_head fused path (vote + selfk reductions) vs the XLA path."""
    from amcontrast3d_tpu.loss.contrast import ambiguity_head
    from amcontrast3d_tpu.ops.knn import set_knn_backend

    b, n0 = 2, 512
    p0 = jnp.asarray(rng.rand(b, n0, 3).astype(np.float32))
    y0 = jnp.asarray(rng.randint(0, 5, (b, n0)).astype(np.int32))
    ups = []
    for i in range(3):
        idxs = np.arange(0, n0, 4 ** i)[: n0 // (4 ** i)]
        ups.append((p0[:, idxs], None))
    args = dict(ARGS, stages_num=3)

    C.set_fused_contrast("off")
    try:
        ref = ambiguity_head(ups, y0, 5, None, args)
    finally:
        C.set_fused_contrast("auto")
    C.set_fused_contrast("on")
    set_knn_backend("approx")
    try:
        got = ambiguity_head(ups, y0, 5, None, args)
    finally:
        set_knn_backend("auto")
        C.set_fused_contrast("auto")
    for a, b_ in zip(got, ref):
        close = np.isclose(np.asarray(a), np.asarray(b_),
                           rtol=1e-5, atol=1e-5)
        assert close.mean() >= 0.995


# ---------------------------------------------------------------------------
# fused DualMasks cross-feature kernel
# ---------------------------------------------------------------------------

def _cross_oracle(p, f, a, k, fusion):
    """Literal kNN oracle with the kernel's documented tie semantics: MIN
    averages all members whose ambiguity equals the member-minimum;
    MIN_ALL0 averages members with a<=0 over K slots (MaskedRefine.py:102)."""
    from amcontrast3d_tpu.ops import knn
    idx, _ = knn(p, p, k)
    idx = idx[..., 1:]
    nid = np.asarray(idx)
    pa = np.asarray(a)
    pf = np.asarray(f)
    B, N, K = nid.shape
    out = np.zeros((B, N, pf.shape[-1]), np.float32)
    for b in range(B):
        for i in range(N):
            mem = nid[b, i]
            am = pa[b, mem]
            if fusion == "MIN":
                m = am.min()
                sel = mem[am == m]
                out[b, i] = pf[b, sel].mean(0)
            else:
                sel = mem[am <= 0]
                out[b, i] = (pf[b, sel].sum(0) / K if len(sel) else 0.0)
    return out


@pytest.mark.parametrize("fusion", ["MIN", "MIN_ALL0"])
def test_dual_masks_cross_matches_oracle(rng, fusion):
    from amcontrast3d_tpu.ops.contrast_pallas import dual_masks_cross
    B, N, Cdim, k = 2, 300, 16, 8
    p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(B, N, Cdim).astype(np.float32))
    # ambiguity with exact ties at 0 (the common real case: interior points)
    a = jnp.asarray(np.where(rng.rand(B, N) < 0.4, 0.0,
                             rng.rand(B, N)).astype(np.float32))
    cross = dual_masks_cross(p, f, a, k, fusion, interpret=True)
    want = _cross_oracle(p, f, a, k, fusion)
    np.testing.assert_allclose(np.asarray(cross), want, rtol=1e-5, atol=1e-5)


def test_dual_masks_cross_multichunk_and_grad(rng):
    """Multi-chunk shape exercises the kd sort + bbox pruning; the VJP must
    equal the autodiff of the oracle mean (w^T g / c)."""
    from amcontrast3d_tpu.ops.contrast_pallas import dual_masks_cross
    B, N, Cdim, k = 1, 2600, 8, 6
    p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(B, N, Cdim).astype(np.float32))
    a = jnp.asarray(np.where(rng.rand(B, N) < 0.3, 0.0,
                             rng.rand(B, N)).astype(np.float32))
    cross = dual_masks_cross(p, f, a, k, "MIN", interpret=True)
    want = _cross_oracle(p, f, a, k, "MIN")
    np.testing.assert_allclose(np.asarray(cross), want, rtol=1e-4, atol=1e-4)

    g = jnp.asarray(rng.randn(B, N, Cdim).astype(np.float32))

    def loss_fused(f_):
        return jnp.sum(dual_masks_cross(p, f_, a, k, "MIN",
                                        interpret=True) * g)

    df = jax.grad(loss_fused)(f)

    # oracle gradient: scatter g/c onto each selected member
    from amcontrast3d_tpu.ops import knn
    idx = np.asarray(knn(p, p, k)[0][..., 1:])
    pa, dg = np.asarray(a), np.asarray(g)
    want_df = np.zeros_like(np.asarray(f))
    for i in range(N):
        mem = idx[0, i]
        am = pa[0, mem]
        sel = mem[am == am.min()]
        for j in sel:
            want_df[0, j] += dg[0, i] / len(sel)
    np.testing.assert_allclose(np.asarray(df), want_df, rtol=1e-4, atol=1e-4)


def test_dual_masks_fused_path_in_module(rng, monkeypatch):
    """dual_masks dispatches to the fused kernel when the gate is forced on
    (CPU -> interpret) and agrees with the XLA path on tie-free ambiguity."""
    from amcontrast3d_tpu.loss import contrast as CC
    from amcontrast3d_tpu.models.refine import dual_masks
    B, N, Cdim = 1, 300, 8
    p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(B, N, Cdim).astype(np.float32))
    a = jnp.asarray(rng.rand(B, N).astype(np.float32))  # unique -> no ties
    ref_f, ref_rate = dual_masks(p, f, a, 8, "MIN", 0.3, 1.0, 0.5)
    CC.set_fused_contrast("on")
    try:
        fus_f, fus_rate = dual_masks(p, f, a, 8, "MIN", 0.3, 1.0, 0.5)
    finally:
        CC.set_fused_contrast("auto")
    assert float(ref_rate) == float(fus_rate)
    np.testing.assert_allclose(np.asarray(fus_f), np.asarray(ref_f),
                               rtol=1e-5, atol=1e-5)
