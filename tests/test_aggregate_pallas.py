"""Fused grouped-aggregation (slot one-hot gather-reduce) vs the gather path.

The kernel replaces gather+BN+act+maxpool over the (B, M, K, C) grouped
tensor (↔ reference ``models/layers/group.py:76-203`` + the first grouped
conv of ``LocalAggregation``) with per-query reductions computed directly
from support values — selection indices are unchanged, so the paths must
agree to float noise.  All kernel runs use interpret mode (CPU suite)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import amcontrast3d_tpu.ops.aggregate_pallas as AP
from amcontrast3d_tpu.ops import ball_query, knn
from amcontrast3d_tpu.ops.aggregate_pallas import (grouped_slot_reduce,
                                                   set_agg_fused)


def _oracle(u, idx, sgn):
    """Gather-path reference: signed extremum + slot moments."""
    B, M, K = idx.shape
    slot = jnp.take_along_axis(
        u, idx.reshape(B, M * K)[..., None].astype(jnp.int32), axis=1
    ).reshape(B, M, K, u.shape[-1])
    ext = sgn * jnp.max(sgn * slot, axis=2)
    return ext, jnp.sum(slot, axis=2), jnp.sum(slot * slot, axis=2)


def _mk(rng, B=2, N=300, M=90, C=12, K=8, radius=0.35, spread=1.0):
    sup_p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * spread)
    q_p = jnp.asarray(rng.rand(B, M, 3).astype(np.float32) * spread)
    u = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = ball_query(sup_p, q_p, radius, K)
    return sup_p, q_p, u, idx


def test_fwd_ballquery(rng):
    sup_p, q_p, u, idx = _mk(rng)
    sgn = jnp.ones((12,), jnp.float32)
    ext, su, sq = grouped_slot_reduce(sup_p, q_p, u, idx, sgn,
                                      radius=0.35, interpret=True)
    we, ws, wq = _oracle(u, idx, sgn)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ws),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(wq),
                               rtol=1e-5, atol=1e-5)


def test_fwd_knn_no_radius(rng):
    sup_p, q_p, u, _ = _mk(rng, C=20)
    idx, _ = knn(sup_p, q_p, 8)
    sgn = jnp.ones((20,), jnp.float32)
    ext, su, sq = grouped_slot_reduce(sup_p, q_p, u, idx, sgn,
                                      radius=None, interpret=True)
    we, ws, wq = _oracle(u, idx, sgn)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ws),
                               rtol=1e-5, atol=1e-5)


def test_fwd_negative_sgn(rng):
    """sgn = −1 channels take the minimum (BN scale sign flips the pool
    direction through the monotone affine)."""
    sup_p, q_p, u, idx = _mk(rng, C=6)
    sgn = jnp.asarray([1, -1, 1, -1, -1, 1], jnp.float32)
    ext, _, _ = grouped_slot_reduce(sup_p, q_p, u, idx, sgn,
                                    radius=0.35, interpret=True)
    we, _, _ = _oracle(u, idx, sgn)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)


def test_fwd_multichunk_pruned(rng):
    """N > CS exercises the kd-sorted chunk loop + bbox pruning (exact)."""
    sup_p, q_p, u, idx = _mk(rng, B=1, N=1400, M=260, C=8, K=8,
                             radius=0.25, spread=3.0)
    sgn = jnp.ones((8,), jnp.float32)
    ext, su, sq = grouped_slot_reduce(sup_p, q_p, u, idx, sgn,
                                      radius=0.25, interpret=True)
    we, ws, wq = _oracle(u, idx, sgn)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ws),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(wq),
                               rtol=1e-5, atol=1e-5)


def test_vjp_matches_gather_autodiff(rng):
    """Custom VJP (support-side matmuls) vs autodiff through the gather
    oracle, with repeat-padded ball-query slots creating max ties — the
    kernel's eq/Σeq split must match jnp.max's even tie split."""
    sup_p, q_p, u, idx = _mk(rng, C=10, radius=0.2)  # small radius → repeats
    sgn = jnp.ones((10,), jnp.float32)
    ge = jnp.asarray(rng.randn(2, 90, 10).astype(np.float32))
    gs = jnp.asarray(rng.randn(2, 90, 10).astype(np.float32))
    gq = jnp.asarray(rng.randn(2, 90, 10).astype(np.float32))

    def down(outs):
        ext, su, sq = outs
        return jnp.sum(ext * ge) + jnp.sum(su * gs) + jnp.sum(sq * gq)

    gf = jax.grad(lambda u_: down(grouped_slot_reduce(
        sup_p, q_p, u_, idx, sgn, radius=0.2, interpret=True)))(u)
    gr = jax.grad(lambda u_: down(_oracle(u_, idx, sgn)))(u)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_vjp_multichunk(rng):
    sup_p, q_p, u, idx = _mk(rng, B=1, N=1200, M=120, C=8, K=8,
                             radius=0.3, spread=2.0)
    sgn = jnp.ones((8,), jnp.float32)
    ct = jnp.asarray(rng.randn(1, 120, 8).astype(np.float32))

    def down(outs):
        ext, su, sq = outs
        return jnp.sum(ext * ct) + 0.3 * jnp.sum(su) + 0.1 * jnp.sum(sq)

    gf = jax.grad(lambda u_: down(grouped_slot_reduce(
        sup_p, q_p, u_, idx, sgn, radius=0.3, interpret=True)))(u)
    gr = jax.grad(lambda u_: down(_oracle(u_, idx, sgn)))(u)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_eval_mode_skips_stats(rng):
    sup_p, q_p, u, idx = _mk(rng)
    sgn = jnp.ones((12,), jnp.float32)
    ext, su, sq = grouped_slot_reduce(sup_p, q_p, u, idx, sgn, radius=0.35,
                                      need_stats=False, interpret=True)
    assert su is None and sq is None
    we, _, _ = _oracle(u, idx, sgn)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)


def test_fits_gate():
    assert AP.agg_fused_fits(24000, 64, 32)
    assert not AP.agg_fused_fits(884736, 64, 32)   # whole-room rung


# ---------------------------------------------------------------------------
# model-level: fused GroupStatsBN tail ≡ gather tail (same params)
# ---------------------------------------------------------------------------

@pytest.fixture
def _fused_mode():
    set_agg_fused("on")
    yield
    set_agg_fused("off")


def _la_module():
    from amcontrast3d_tpu.models.pointnext import LocalAggregation
    return LocalAggregation(
        channels=[16, 24],
        norm_args={"norm": "bn"}, act_args={"act": "relu"},
        group_args={"NAME": "ballquery", "radius": 0.3, "nsample": 8},
        conv_args={"order": "conv-norm-act"})


def test_local_aggregation_fused_parity(rng, _fused_mode):
    mod = _la_module()
    p = jnp.asarray(rng.rand(2, 260, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(2, 260, 16).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), p, f, training=False)

    set_agg_fused("off")
    out_g, st_g = mod.apply(variables, p, f, training=True,
                            mutable=["batch_stats"])
    set_agg_fused("on")
    out_f, st_f = mod.apply(variables, p, f, training=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_g),
                               rtol=2e-4, atol=2e-4)
    ga = jax.tree_util.tree_leaves(st_g["batch_stats"])
    fa = jax.tree_util.tree_leaves(st_f["batch_stats"])
    for x, y in zip(ga, fa):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-4)

    # eval mode (running stats, need_stats=False path)
    set_agg_fused("off")
    ev_g = mod.apply(variables, p, f, training=False)
    set_agg_fused("on")
    ev_f = mod.apply(variables, p, f, training=False)
    np.testing.assert_allclose(np.asarray(ev_f), np.asarray(ev_g),
                               rtol=2e-4, atol=2e-4)


def test_local_aggregation_fused_grads(rng, _fused_mode):
    mod = _la_module()
    p = jnp.asarray(rng.rand(1, 220, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(1, 220, 16).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(1), p, f, training=False)
    tgt = jnp.asarray(rng.randn(1, 220, 24).astype(np.float32))

    def loss(params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            p, f, training=True, mutable=["batch_stats"])
        return jnp.mean((out - tgt) ** 2)

    set_agg_fused("off")
    lg, gg = jax.value_and_grad(loss)(variables["params"])
    set_agg_fused("on")
    lf, gf = jax.value_and_grad(loss)(variables["params"])
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-5)
    key = lambda e: jax.tree_util.keystr(e[0])
    for (kp, x), (_, y) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(gg), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(gf), key=key)):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp))


def test_set_abstraction_fused_parity(rng, _fused_mode):
    from amcontrast3d_tpu.models.pointnext import SetAbstraction
    mod = SetAbstraction(
        in_channels=16, out_channels=32, layers=2, stride=4,
        group_args={"NAME": "ballquery", "radius": 0.4, "nsample": 8},
        norm_args={"norm": "bn"}, act_args={"act": "relu"})
    p = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(2, 256, 16).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(2), p, f, training=False)

    set_agg_fused("off")
    (pg, og), st_g = mod.apply(variables, p, f, training=True,
                               mutable=["batch_stats"])
    set_agg_fused("on")
    (pf, of), st_f = mod.apply(variables, p, f, training=True,
                               mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(pf), np.asarray(pg))
    np.testing.assert_allclose(np.asarray(of), np.asarray(og),
                               rtol=2e-4, atol=2e-4)
    for x, y in zip(jax.tree_util.tree_leaves(st_g["batch_stats"]),
                    jax.tree_util.tree_leaves(st_f["batch_stats"])):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=2e-4, atol=2e-4)


def test_local_aggregation_fused_bf16(rng, _fused_mode):
    """use_amp axis: bf16 model dtype through the fused tail stays inside
    the documented bf16 envelope vs the gather tail at the same dtype."""
    from amcontrast3d_tpu.models.pointnext import LocalAggregation
    mod = LocalAggregation(
        channels=[16, 24],
        norm_args={"norm": "bn"}, act_args={"act": "relu"},
        group_args={"NAME": "ballquery", "radius": 0.3, "nsample": 8},
        conv_args={"order": "conv-norm-act"}, dtype=jnp.bfloat16)
    p = jnp.asarray(rng.rand(2, 200, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(2, 200, 16).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), p, f, training=False)
    set_agg_fused("off")
    out_g, _ = mod.apply(variables, p, f, training=True,
                         mutable=["batch_stats"])
    set_agg_fused("on")
    out_f, _ = mod.apply(variables, p, f, training=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_g, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_param_tree_invariant(rng, _fused_mode):
    """Checkpoints must be backend-invariant: the fused tail declares the
    exact param/stat tree of the nn.BatchNorm it replaces."""
    mod = _la_module()
    p = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    f = jnp.asarray(rng.randn(1, 64, 16).astype(np.float32))
    set_agg_fused("on")
    v_f = mod.init(jax.random.PRNGKey(0), p, f, training=False)
    set_agg_fused("off")
    v_g = mod.init(jax.random.PRNGKey(0), p, f, training=False)
    assert (jax.tree_util.tree_structure(v_f)
            == jax.tree_util.tree_structure(v_g))
    for x, y in zip(jax.tree_util.tree_leaves(v_f),
                    jax.tree_util.tree_leaves(v_g)):
        assert x.shape == y.shape and x.dtype == y.dtype
