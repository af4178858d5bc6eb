"""Loss-layer tests: CE parity with torch formulae, contrast-loss semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.loss import (CrossEntropyAce, CrossEntropyAcePre,
                                   SmoothCrossEntropy, contrast_head,
                                   cross_entropy, one_hot_labels,
                                   point_contrast_margin, subscene_labels)

AARGS = dict(nsample=8, ccbeta=0.04, cctype="Method2", temperature=0.3,
             supervisedCL="Method1", db="-m", margin="adaptive", mu=-1,
             nu=0.5, w1=0.1, w2=0.9, w3=0.01, stages="up", stages_num=2)


def test_cross_entropy_matches_manual(rng):
    logits = jnp.array(rng.randn(50, 7).astype(np.float32))
    target = jnp.array(rng.randint(0, 7, (50,)))
    got = float(cross_entropy(logits, target))
    logp = np.log(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True))
    want = -np.mean(logp[np.arange(50), np.asarray(target)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_ignore_index(rng):
    logits = jnp.array(rng.randn(10, 5).astype(np.float32))
    target = np.array([0, 1, 2, 3, 4, -100, -100, 0, 1, 2])
    got = float(cross_entropy(logits, jnp.array(target)))
    valid = target != -100
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = -np.mean(logp[np.arange(10), np.where(valid, target, 0)][valid])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_smooth_ce_matches_reference_formula(rng):
    logits = jnp.array(rng.randn(30, 13).astype(np.float32))
    target = np.array(rng.randint(0, 13, (30,)))
    sce = SmoothCrossEntropy(label_smoothing=0.2, num_classes=13)
    got = float(sce(logits, jnp.array(target)))
    oh = np.eye(13)[target]
    oh = oh * 0.8 + (1 - oh) * 0.2 / 12
    logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    want = -np.mean((oh * logp).sum(-1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_one_hot_labels_ignore_index():
    t = jnp.array([[0, 2, -100]])
    oh = one_hot_labels(t, 3, ignore_index=-100)
    assert oh.shape == (1, 3, 4)
    np.testing.assert_array_equal(np.asarray(oh[0, 2]), [0, 0, 0, 1])


def test_subscene_labels_stage0_identity(rng):
    t = jnp.array(rng.randint(0, 5, (2, 16)))
    oh = one_hot_labels(t, 5)
    p0 = jnp.array(rng.rand(2, 16, 3).astype(np.float32))
    out = subscene_labels(oh, p0, p0, 0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(oh))


def test_subscene_labels_soft_mean(rng):
    p0 = jnp.array(rng.rand(1, 64, 3).astype(np.float32))
    t = jnp.array(rng.randint(0, 4, (1, 64)))
    oh = one_hot_labels(t, 4)
    ps = p0[:, :16]
    out = np.asarray(subscene_labels(oh, p0, ps, 1))  # kr = 4
    assert out.shape == (1, 16, 4)
    np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)
    # multiples of 1/4
    np.testing.assert_allclose(out * 4, np.round(out * 4), atol=1e-5)


def _separable_stage(rng, n=64, c=16):
    """Two spatial clusters with distinct labels and features."""
    p = rng.rand(1, n, 3).astype(np.float32)
    p[:, n // 2:, 0] += 5.0
    t = np.zeros((1, n), dtype=np.int64)
    t[:, n // 2:] = 1
    f = rng.randn(1, n, c).astype(np.float32)
    f[:, n // 2:] += 3.0
    return jnp.array(p), jnp.array(f), jnp.array(t)


def test_point_contrast_margin_runs_and_finite(rng):
    p, f, t = _separable_stage(rng)
    labels = one_hot_labels(t, 2)
    loss, a = point_contrast_margin(p, f, labels, AARGS)
    assert np.isfinite(float(loss))
    a = np.asarray(a)
    # perfectly separated clusters (far apart) → all points inner → a == 0
    assert a.shape == (1, 64)
    assert np.all((a >= 0) & (a <= 1))


def test_contrast_loss_decreases_for_aligned_features(rng):
    """Features aligned with labels must give lower loss than anti-aligned."""
    n = 48
    p = rng.rand(1, n, 3).astype(np.float32)  # mixed clusters → boundaries
    t = (p[..., 0] > 0.5).astype(np.int64)
    labels = one_hot_labels(jnp.array(t), 2)
    f_good = np.where(t[..., None] > 0, 1.0, -1.0) * np.ones((1, n, 8), np.float32)
    f_good += rng.randn(1, n, 8).astype(np.float32) * 0.05
    f_bad = np.array(rng.randn(1, n, 8).astype(np.float32))
    lg, _ = point_contrast_margin(jnp.array(p), jnp.array(f_good), labels, AARGS)
    lb, _ = point_contrast_margin(jnp.array(p), jnp.array(f_bad), labels, AARGS)
    assert float(lg) < float(lb)


def test_contrast_grad_flows_to_features(rng):
    p, f, t = _separable_stage(rng, n=32, c=8)
    # ensure boundary points exist: interleave clusters spatially
    p = jnp.array(rng.rand(1, 32, 3).astype(np.float32))
    labels = one_hot_labels(t, 2)

    def loss_fn(f):
        l, _ = point_contrast_margin(p, f, labels, AARGS)
        return l

    g = jax.grad(loss_fn)(f)
    g = np.asarray(g)
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0


def test_cross_entropy_ace_composite(rng):
    n = 64
    p0 = jnp.array(rng.rand(1, n, 3).astype(np.float32))
    t = jnp.array(rng.randint(0, 3, (1, n)))
    logits = jnp.array(rng.randn(1, n, 3).astype(np.float32))
    stages = [(p0, jnp.array(rng.randn(1, n, 8).astype(np.float32))),
              (p0[:, :16], jnp.array(rng.randn(1, 16, 16).astype(np.float32)))]
    crit = CrossEntropyAce()
    loss = crit(logits, t, stages, 3, None, AARGS)
    assert np.isfinite(float(loss))


def test_cross_entropy_ace_pre_composite(rng):
    n = 64
    p0 = jnp.array(rng.rand(1, n, 3).astype(np.float32))
    t = jnp.array(rng.randint(0, 3, (1, n)))
    logits = jnp.array(rng.randn(1, n, 3).astype(np.float32))
    stages = [(p0, jnp.array(rng.randn(1, n, 8).astype(np.float32))),
              (p0[:, :16], jnp.array(rng.randn(1, 16, 16).astype(np.float32)))]
    pred_ai = [jnp.array(rng.rand(1, n).astype(np.float32)),
               jnp.array(rng.rand(1, 16).astype(np.float32))]
    crit = CrossEntropyAcePre()
    seg, ce, con, reg = crit(logits, t, stages, pred_ai, 3, None, AARGS)
    for v in (seg, ce, con, reg):
        assert np.isfinite(float(v))
    np.testing.assert_allclose(float(seg), float(ce) + float(con), rtol=1e-5)
