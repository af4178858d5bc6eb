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


def test_qp_moments_and_grads(rng):
    """In-kernel h = u_slot − qp moments match the gather oracle, and the
    custom VJP's host-side dqp matches autodiff."""
    sup_p, q_p, u, idx = _mk(rng, C=12)
    qp = jnp.asarray(rng.randn(2, 90, 12).astype(np.float32))
    sgn = jnp.ones((12,), jnp.float32)

    def oracle_h(u_, qp_):
        B, M, K = idx.shape
        slot = jnp.take_along_axis(
            u_, idx.reshape(B, M * K)[..., None].astype(jnp.int32), axis=1
        ).reshape(B, M, K, u_.shape[-1])
        h = slot - qp_[:, :, None, :]
        ext = sgn * jnp.max(sgn * slot, axis=2)     # ext stays in u-space
        return ext, jnp.sum(h, axis=2), jnp.sum(h * h, axis=2)

    ext, su, sq = grouped_slot_reduce(sup_p, q_p, u, idx, sgn,
                                      radius=0.35, qp=qp, interpret=True)
    we, ws, wq = oracle_h(u, qp)
    np.testing.assert_allclose(np.asarray(ext), np.asarray(we),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(su), np.asarray(ws),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(wq),
                               rtol=1e-5, atol=1e-5)

    ge = jnp.asarray(rng.randn(2, 90, 12).astype(np.float32))
    gs = jnp.asarray(rng.randn(2, 90, 12).astype(np.float32))
    gq = jnp.asarray(rng.randn(2, 90, 12).astype(np.float32))

    def down(outs):
        e, s_, q_ = outs
        return jnp.sum(e * ge) + jnp.sum(s_ * gs) + jnp.sum(q_ * gq)

    gu_f, gqp_f = jax.grad(
        lambda u_, qp_: down(grouped_slot_reduce(
            sup_p, q_p, u_, idx, sgn, radius=0.35, qp=qp_,
            interpret=True)), argnums=(0, 1))(u, qp)
    gu_r, gqp_r = jax.grad(
        lambda u_, qp_: down(oracle_h(u_, qp_)), argnums=(0, 1))(u, qp)
    np.testing.assert_allclose(np.asarray(gu_f), np.asarray(gu_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gqp_f), np.asarray(gqp_r),
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


def test_full_train_step_fused_matches_gather(rng, _fused_mode):
    """The fused tail composes through the whole AA objective: one jitted
    train step (fwd+bwd+adamw) from identical state matches the gather
    path to float noise, and training continues finite."""
    import sys
    sys.path.insert(0, "tests")
    from test_models import CLS_ARGS, ENCODER_ARGS
    from test_train_step import AARGS, _batch, _tx
    from amcontrast3d_tpu.engine import create_train_state, make_train_step
    from amcontrast3d_tpu.loss import CrossEntropyAce
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D

    # 4 stages / 512 points: the coarsest stage keeps 8 distinct points —
    # a 1-point stage makes train-mode BN ill-conditioned (variance ~0 over
    # repeated values) and rsqrt(var+eps) amplifies 1e-7 moment noise into
    # O(0.1) output diffs on BOTH paths' fast-variance forms
    enc_args = dict(ENCODER_ARGS, blocks=[1, 1, 1, 1], strides=[1, 4, 4, 4])
    aargs = dict(AARGS, stages_num=3)
    model = BaseSeg_AMContrast3D(encoder_args=enc_args,
                                 decoder_args={"decoder_stages": 3},
                                 cls_args=CLS_ARGS)
    batch = _batch(rng, b=2, n=512)
    tx = _tx()
    rngk = jax.random.PRNGKey(1)

    set_agg_fused("off")
    state0 = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step = make_train_step(model, CrossEntropyAce(), tx, "aa", 13,
                           None, aargs)
    sg, mg = step(state0, batch, rngk)

    set_agg_fused("on")
    state0 = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    sf, mf = step(state0, batch, rngk)
    np.testing.assert_allclose(float(mf["loss"]), float(mg["loss"]),
                               rtol=1e-4)
    # batch stats after the step must agree tightly (the closed-form
    # GroupStatsBN statistics vs the grouped-tensor BN)
    for x, y in zip(jax.tree_util.tree_leaves(sg.batch_stats),
                    jax.tree_util.tree_leaves(sf.batch_stats)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-3, atol=1e-5)
    # a second step from each path's own state stays loss-consistent
    # (params are NOT compared element-wise: adamw's first-step update is
    # sign-like, so float-noise grads legitimately flip tiny updates)
    s2g, m2g = step(sg, batch, rngk)
    s2f, m2f = step(sf, batch, rngk)
    assert np.isfinite(float(m2f["loss"]))
    np.testing.assert_allclose(float(m2f["loss"]), float(m2g["loss"]),
                               rtol=5e-3)


def test_sharded_step_fused_syncbn(rng, _fused_mode):
    """GroupStatsBN's closed-form SyncBN (pmean of reconstructed stats)
    under shard_map on the 8-device mesh: equal shards (one cloud tiled
    8x) must track the single-device global-batch run."""
    import sys
    sys.path.insert(0, "tests")
    from test_models import CLS_ARGS, ENCODER_ARGS
    from test_train_step import AARGS, _batch, _tx
    from amcontrast3d_tpu.engine import (create_train_state,
                                         make_sharded_train_step,
                                         make_train_step)
    from amcontrast3d_tpu.loss import CrossEntropyAce
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D
    from amcontrast3d_tpu.parallel import get_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8
    mesh = get_mesh(8)
    enc_args = dict(ENCODER_ARGS, blocks=[1, 1, 1], strides=[1, 4, 4])
    # dropout off: the sharded path folds a per-shard rng key by design, so
    # dropout draws can never match across topologies (same as the gather
    # path's DDP equivalence test); 256 points keeps the coarsest stage
    # (16 pts) away from degenerate-BN territory
    cls_args = dict(CLS_ARGS, dropout=0.0)
    aargs = dict(AARGS, stages_num=2)
    one = _batch(rng, b=1, n=256)
    batch = {k: jnp.tile(v, (8,) + (1,) * (v.ndim - 1))
             for k, v in one.items()}
    tx = _tx()
    rngk = jax.random.PRNGKey(1)

    set_agg_fused("on")
    # single device, global batch (no axis name)
    model1 = BaseSeg_AMContrast3D(encoder_args=enc_args,
                                  decoder_args={"decoder_stages": 2},
                                  cls_args=cls_args)
    state1 = create_train_state(model1, tx, one, jax.random.PRNGKey(0))
    step1 = make_train_step(model1, CrossEntropyAce(), tx, "aa", 13,
                            None, aargs)
    s1, m1 = step1(state1, batch, rngk)

    # 8-way shard_map with SyncBN axis
    model8 = BaseSeg_AMContrast3D(encoder_args=enc_args,
                                  decoder_args={"decoder_stages": 2},
                                  cls_args=cls_args, bn_axis_name="dp")
    state8 = create_train_state(model8, tx, one, jax.random.PRNGKey(0))
    state8 = replicate(state8, mesh)
    step8 = make_sharded_train_step(
        make_train_step(model8, CrossEntropyAce(), tx, "aa", 13, None,
                        aargs, axis_name="dp"), mesh)
    s8, m8 = step8(state8, shard_batch(batch, mesh),
                   replicate(rngk, mesh))
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=5e-4)
    for x, y in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(
                        jax.device_get(s8.batch_stats))):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=5e-3, atol=5e-4)


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
