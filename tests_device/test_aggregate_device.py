"""Compiled slot one-hot gather-reduce kernel vs the gather path on real TPU.

tests/test_aggregate_pallas.py proves the equivalence in interpret mode;
this tier catches Mosaic lowering regressions in the compiled forward and
the support-side matmul VJP (the kernels the encoder actually trains with
when AMC3D_AGG_FUSED is on)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.ops import ball_query
from amcontrast3d_tpu.ops.aggregate_pallas import (grouped_slot_reduce,
                                                   set_agg_fused)

pytestmark = pytest.mark.tpu


def _oracle(u, idx, sgn):
    B, M, K = idx.shape
    slot = jnp.take_along_axis(
        u, idx.reshape(B, M * K)[..., None].astype(jnp.int32), axis=1
    ).reshape(B, M, K, u.shape[-1])
    ext = sgn * jnp.max(sgn * slot, axis=2)
    return ext, jnp.sum(slot, axis=2), jnp.sum(slot * slot, axis=2)


def test_slot_reduce_compiled(rng):
    """Training shapes (SA1-ish): multichunk kd-sorted support with bbox
    pruning, fp32 3x-bf16 split → tight agreement with the gather path."""
    B, N, M, C, K, radius = 2, 8192, 2048, 64, 32, 0.35
    sup_p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 4)
    q_p = sup_p[:, :M]
    u = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    idx = jax.block_until_ready(ball_query(sup_p, q_p, radius, K))
    sgn = jnp.where(jnp.asarray(rng.randn(C)) > 0, 1.0, -1.0).astype(
        jnp.float32)
    ge = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    gs = jnp.asarray(rng.randn(B, M, C).astype(np.float32))
    gq = jnp.asarray(rng.randn(B, M, C).astype(np.float32) * 0.1)

    def down(outs):
        ext, su, sq = outs
        return (jnp.sum(ext * ge) + jnp.sum(su * gs)
                + jnp.sum(sq * gq)), (ext, su, sq)

    # positions/idx MUST be jit arguments, not closed-over constants: the
    # remote-TPU platform miscompiles gathers whose operands are baked-in
    # XLA literals (~97% wrong elements on the morton-permuted idx gather),
    # while the traced path — what the real train step runs — is exact.
    # See docs/DEVIATIONS.md §15.
    def run_fused(u_, sup_p_, q_p_, idx_):
        return down(grouped_slot_reduce(sup_p_, q_p_, u_, idx_, sgn,
                                        radius=radius))

    def run_ref(u_, sup_p_, q_p_, idx_):
        return down(_oracle(u_, idx_, sgn))

    (lf, (ext_f, su_f, sq_f)), gf = jax.jit(
        jax.value_and_grad(run_fused, has_aux=True))(u, sup_p, q_p, idx)
    (lr, (ext_r, su_r, sq_r)), gr = jax.jit(
        jax.value_and_grad(run_ref, has_aux=True))(u, sup_p, q_p, idx)

    np.testing.assert_allclose(np.asarray(ext_f), np.asarray(ext_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(su_f), np.asarray(su_r),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sq_f), np.asarray(sq_r),
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(float(lf), float(lr), rtol=1e-4)
    gf, gr = np.asarray(gf), np.asarray(gr)
    cos = float((gf * gr).sum()
                / (np.linalg.norm(gf) * np.linalg.norm(gr) + 1e-30))
    assert cos >= 0.9999, cos
    np.testing.assert_allclose(gf, gr, rtol=1e-3, atol=1e-3)


def test_model_tail_compiled(rng):
    """LocalAggregation with the fused tail vs the gather tail, compiled,
    train mode (GroupStatsBN closed-form batch statistics)."""
    from amcontrast3d_tpu.models.pointnext import LocalAggregation
    mod = LocalAggregation(
        channels=[32, 64],
        norm_args={"norm": "bn"}, act_args={"act": "relu"},
        group_args={"NAME": "ballquery", "radius": 0.3, "nsample": 16},
        conv_args={"order": "conv-norm-act"})
    p = jnp.asarray(rng.rand(2, 4096, 3).astype(np.float32) * 3)
    f = jnp.asarray(rng.randn(2, 4096, 32).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), p, f, training=False)
    tgt = jnp.asarray(rng.randn(2, 4096, 64).astype(np.float32))

    # EVERY array is a jit ARGUMENT — constant-fed (closed-over) operands
    # miscompile gathers on this platform; even a closed-over batch_stats
    # dict reproduced the corruption (see test_slot_reduce_compiled /
    # DEVIATIONS §15)
    def loss(params, bs, p_, f_):
        out, st = mod.apply(
            {"params": params, "batch_stats": bs},
            p_, f_, training=True, mutable=["batch_stats"])
        return jnp.mean((out - tgt) ** 2), (out, st)

    try:
        set_agg_fused("off")
        (lg, (og, sg)), gg = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(
                variables["params"], variables["batch_stats"], p, f)
        set_agg_fused("on")
        (lf, (of, sf)), gf = jax.jit(
            jax.value_and_grad(loss, has_aux=True))(
                variables["params"], variables["batch_stats"], p, f)
    finally:
        set_agg_fused("off")

    np.testing.assert_allclose(np.asarray(of), np.asarray(og),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(float(lf), float(lg), rtol=1e-4)
    for x, y in zip(jax.tree_util.tree_leaves(sg["batch_stats"]),
                    jax.tree_util.tree_leaves(sf["batch_stats"])):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=5e-4, atol=5e-4)
    for x, y in zip(jax.tree_util.tree_leaves(gg),
                    jax.tree_util.tree_leaves(gf)):
        x, y = np.asarray(x), np.asarray(y)
        cos = float((x * y).sum()
                    / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-30))
        assert cos >= 0.999, cos
