"""Numerical parity of the adaptive-margin contrast loss against a literal
numpy transcription of the reference equations.

The oracle reproduces MarginContrast.py:220-259 + AEF/ambiguity.py:11-93
step by step: exact kNN, self-loop drop, posmask via argmax labels,
ambiguity with global max(mask_num), boundary-subset *gather* (the reference
filters rows; our implementation uses a validity mask — the means must
match), cosine similarity, adaptive margin, db='-m', temperature, Method1
soft-NN ratio.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu import ops
from amcontrast3d_tpu.loss import one_hot_labels, point_contrast_margin

_EPS = 1e-12


def oracle_contrast(p, f, labels_onehot, nsample, mu, nu, ccbeta, T):
    """Single cloud (N, 3)/(N, C)/(N, ncls) → reference loss + ambiguity."""
    N = len(p)
    d = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :nsample]
    idx = idx[:, 1:]  # drop self
    K = nsample - 1
    lab = labels_onehot.argmax(-1)
    neigh_lab = lab[idx]
    posmask = lab[:, None] == neigh_lab  # (N, K)

    # ambiguity (Method2)
    mask_num = posmask.sum(-1)
    maxc = mask_num.max()
    a = np.abs(mask_num - maxc) / maxc
    boundary = (0 < mask_num) & (mask_num < maxc)
    dd = np.take_along_axis(d, idx, axis=-1)  # (N, K) squared distances
    n_pos = mask_num[boundary]
    n_neg = K - mask_num[boundary]
    pm_b = posmask[boundary]
    dd_b = dd[boundary]
    d_pos = (pm_b * dd_b).sum(-1)
    d_neg = ((1 - pm_b) * dd_b).sum(-1)
    cc = n_pos / d_pos - n_neg / d_neg
    a_soft = 1.0 / (1.0 + np.exp(ccbeta * cc))
    a = a.astype(np.float64)
    a[boundary] = a_soft

    # loss over the 0 < a <= 1 subset (gathered, as the reference does)
    sel = (a > 0) & (a <= 1)
    fs = f[sel]
    nf = f[idx][sel]  # (m, K, C)
    pm = posmask[sel]
    amb = a[sel]
    cos = (fs[:, None, :] * nf).sum(-1) / (
        np.maximum(np.linalg.norm(fs, axis=-1)[:, None]
                   * np.linalg.norm(nf, axis=-1), 1e-8))
    margin = mu * amb[:, None] + nu
    dist = (cos - margin) * pm + cos * (~pm)
    dist = dist / T
    e = np.exp(dist)
    pos = (e * pm).sum(-1)
    pos_neg = e.sum(-1)
    loss = -np.log(pos / pos_neg + _EPS)
    return loss.mean(), a


@pytest.mark.parametrize("seed", [0, 3])
def test_contrast_loss_matches_reference_equations(seed):
    rng = np.random.RandomState(seed)
    N, C, ncls, nsample = 96, 16, 4, 8
    p = rng.rand(N, 3).astype(np.float32)
    f = rng.randn(N, C).astype(np.float32)
    t = (p[:, 0] * 2 + p[:, 1] * 2).astype(np.int64) % ncls
    oh = np.eye(ncls, dtype=np.float32)[t]

    args = dict(nsample=nsample, ccbeta=0.04, cctype="Method2",
                temperature=0.3, supervisedCL="Method1", db="-m",
                margin="adaptive", mu=-1, nu=0.5)
    got_loss, got_a = point_contrast_margin(
        jnp.asarray(p[None]), jnp.asarray(f[None]),
        one_hot_labels(jnp.asarray(t[None]), ncls), args)
    want_loss, want_a = oracle_contrast(p, f, oh, nsample, mu=-1, nu=0.5,
                                        ccbeta=0.04, T=0.3)
    np.testing.assert_allclose(np.asarray(got_a)[0], want_a,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(got_loss), want_loss, rtol=1e-4)


def test_contrast_method2_and_db_plus(rng):
    """supervisedCL='Method2' and db='+m' variants stay finite and differ
    from Method1 (coverage of the alternative formulas)."""
    N, C, ncls = 64, 8, 3
    p = jnp.asarray(rng.rand(1, N, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(1, N, C).astype(np.float32))
    t = jnp.asarray(rng.randint(0, ncls, (1, N)))
    labels = one_hot_labels(t, ncls)
    base = dict(nsample=8, ccbeta=0.04, cctype="Method3", temperature=0.3,
                supervisedCL="Method1", db="-m", margin="constant", mu=-1,
                nu=0.5)
    l1, _ = point_contrast_margin(p, f, labels, base)
    l2, _ = point_contrast_margin(p, f, labels,
                                  dict(base, supervisedCL="Method2"))
    l3, _ = point_contrast_margin(p, f, labels, dict(base, db="+m"))
    l4, _ = point_contrast_margin(p, f, labels, dict(base, margin="learned"))
    for l in (l1, l2, l3, l4):
        assert np.isfinite(float(l))
    assert float(l1) != float(l2)
    assert float(l1) != float(l3)


def test_contrast_head_remat_matches(rng):
    """ambiguity_args.remat=True (jax.checkpoint around each per-stage
    contrast loss, kNN outputs saved) must be numerically identical to the
    default path in both loss value and feature gradients."""
    import jax
    from amcontrast3d_tpu.loss.contrast import contrast_head

    B, ncls = 2, 4
    stages = []
    for n, c in [(128, 16), (32, 24)]:
        p = jnp.asarray(rng.rand(B, n, 3).astype(np.float32))
        f = jnp.asarray(rng.randn(B, n, c).astype(np.float32))
        stages.append((p, f))
    t = jnp.asarray(rng.randint(0, ncls, (B, 128)))
    base = dict(nsample=8, ccbeta=0.04, cctype="Method2", temperature=0.3,
                supervisedCL="Method1", db="-m", margin="adaptive",
                mu=-1, nu=0.5, stages_num=2)

    def run(args):
        def loss_fn(fs):
            st = [(stages[i][0], fs[i]) for i in range(2)]
            return contrast_head(st, t, ncls, None, args)[0]
        feats = [f for _, f in stages]
        return jax.value_and_grad(loss_fn)(feats)

    l0, g0 = run(base)
    l1, g1 = run(dict(base, remat=True))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
