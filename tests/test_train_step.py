"""End-to-end train-step tests: single device and 8-device CPU mesh.

These are the tiny-cloud regression tests SURVEY.md §4 calls for — a few
optimization steps must run, reduce the loss, and keep every tensor finite,
for each model family ('base', 'aa', 'mm'), plus the sharded data-parallel
variant on the virtual mesh (the fake-backend analog the reference lacks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.engine import (build_tx, create_train_state,
                                     make_eval_step, make_sharded_eval_step,
                                     make_sharded_train_step, make_train_step)
from amcontrast3d_tpu.loss import (CrossEntropy, CrossEntropyAce,
                                   CrossEntropyAcePre)
from amcontrast3d_tpu.models import (BaseSeg, BaseSeg_AMContrast3D,
                                     BaseSeg_M_AMContrast3D)
from amcontrast3d_tpu.parallel import get_mesh, replicate, shard_batch
from amcontrast3d_tpu.scheduler import as_step_schedule, build_scheduler_from_cfg

from test_models import APM_ARGS, CLS_ARGS, ENCODER_ARGS

NCLS = 13


def _batch(rng, b=2, n=512):
    pos = rng.rand(b, n, 3).astype(np.float32) * 2
    x = rng.rand(b, n, 4).astype(np.float32)
    # labels correlated with geometry so learning is possible
    y = (pos[..., 0] > 1.0).astype(np.int64) + (pos[..., 1] > 1.0).astype(np.int64)
    return {"pos": jnp.array(pos), "x": jnp.array(x), "y": jnp.array(y)}


AARGS = dict(nsample=8, ccbeta=0.04, cctype="Method2", temperature=0.3,
             supervisedCL="Method1", db="-m", margin="adaptive", mu=-1,
             nu=0.5, w1=0.1, w2=0.9, w3=0.01, stages="up", stages_num=4)


def _tx():
    lr_fn, _ = build_scheduler_from_cfg({"sched": "cosine", "epochs": 10,
                                         "lr": 0.01, "min_lr": 1e-5})
    return build_tx({"NAME": "adamw", "weight_decay": 1e-4},
                    as_step_schedule(lr_fn, steps_per_epoch=5),
                    grad_norm_clip=10.0)


@pytest.mark.parametrize("kind", ["base", "aa", "mm"])
def test_train_step_reduces_loss(rng, kind):
    if kind == "base":
        model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={}, cls_args=CLS_ARGS)
        criterion = CrossEntropy(label_smoothing=0.2)
    elif kind == "aa":
        model = BaseSeg_AMContrast3D(encoder_args=ENCODER_ARGS,
                                     decoder_args={}, cls_args=CLS_ARGS)
        criterion = CrossEntropyAce()
    else:
        model = BaseSeg_M_AMContrast3D(encoder_args=ENCODER_ARGS,
                                       decoder_args={}, cls_args=CLS_ARGS,
                                       APM_args=APM_ARGS, AEF_args=AARGS)
        criterion = CrossEntropyAcePre()
    batch = _batch(rng)
    tx = _tx()
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, criterion, tx, kind, NCLS,
                                   None, AARGS))
    rngk = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, rngk)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    if kind == "mm":
        for k in ("loss_seg", "loss_ce", "loss_contrast", "loss_reg",
                  "refine_rate"):
            assert np.isfinite(float(metrics[k]))
    # eval path
    ev = jax.jit(make_eval_step(model, kind, NCLS))
    out = ev(state, batch)
    assert out["cm"].shape == (NCLS, NCLS)
    assert int(out["cm"].sum()) == batch["y"].size


def test_sharded_train_step_matches_dp_semantics(rng):
    """8-way data parallel on the CPU mesh: runs, reduces loss, and keeps
    params replicated-identical (grad pmean ≡ DDP allreduce)."""
    assert len(jax.devices()) == 8
    mesh = get_mesh(8)
    # shallow 3-stage encoder so a 128-point per-shard cloud never hits a
    # zero-size stage (128 → 32 → 8)
    enc_args = dict(ENCODER_ARGS, blocks=[1, 1, 1], strides=[1, 4, 4])
    aargs = dict(AARGS, stages_num=2)
    model = BaseSeg_AMContrast3D(encoder_args=enc_args,
                                 decoder_args={"decoder_stages": 2},
                                 cls_args=CLS_ARGS, bn_axis_name="dp")
    criterion = CrossEntropyAce()
    batch = _batch(rng, b=8, n=128)
    tx = _tx()

    # init on one shard's worth, then replicate
    local = {k: v[:1] for k, v in batch.items()}
    state = create_train_state(model, tx, local, jax.random.PRNGKey(0))
    state = replicate(state, mesh)
    sbatch = shard_batch(batch, mesh)

    step = make_sharded_train_step(
        make_train_step(model, criterion, tx, "aa", NCLS, None, aargs,
                        axis_name="dp"), mesh)
    rngk = replicate(jax.random.PRNGKey(1), mesh)
    losses = []
    for _ in range(3):
        state, metrics = step(state, sbatch, rngk)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert int(metrics["cm"].sum()) == batch["y"].size  # psum over shards

    ev = make_sharded_eval_step(make_eval_step(model, "aa", NCLS,
                                               axis_name="dp"), mesh)
    out = ev(state, sbatch)
    assert out["logits"].shape == (8, 128, NCLS)
    assert int(out["cm"].sum()) == batch["y"].size


def test_sharded_multiepoch_equals_single_device(rng, tmp_path):
    """DDP semantics over epochs (SURVEY §2.7: identical math, sharded
    execution): 3 epochs of train+val on the 8-device CPU mesh track a
    single-device run at the same global batch/seed step-for-step, and a
    checkpoint written from the sharded topology restores bit-identically
    into the single-device one and keeps training.

    Each batch is one cloud tiled 8x: with equal shard contributions, DDP's
    mean-of-shard-means provably equals the single-device global mean for
    the loss (incl. the masked contrast means, whose denominators otherwise
    legitimately differ per shard — the reference's DDP has the same
    property), SyncBN batch stats, and gradients; the only divergence left
    is fp32 reassociation across the reduction trees, so trajectories are
    compared at tight-but-not-bitwise tolerance.  SegHead dropout is off:
    the sharded path folds a per-shard key (by design — independent masks
    per replica), so dropout draws can never match across topologies."""
    assert len(jax.devices()) == 8
    mesh = get_mesh(8)
    enc_args = dict(ENCODER_ARGS, blocks=[1, 1, 1], strides=[1, 4, 4])
    cls_args = dict(CLS_ARGS, dropout=0.0)
    aargs = dict(AARGS, stages_num=2)
    crit = CrossEntropyAce()
    # SGD+momentum: updates are LINEAR in the gradients, so cross-topology
    # fp32 noise stays additive over the whole trajectory (adam's g/sqrt(v)
    # flips sign on noise-level gradient elements at step one — per-element
    # equality is unprovable under it)
    lr_fn, _ = build_scheduler_from_cfg({"sched": "cosine", "epochs": 10,
                                         "lr": 0.01, "min_lr": 1e-5})
    tx = build_tx({"NAME": "sgd", "momentum": 0.9, "weight_decay": 1e-4},
                  as_step_schedule(lr_fn, steps_per_epoch=5),
                  grad_norm_clip=10.0)
    epochs, steps = 3, 2

    def _tiled(b1):
        return {k: jnp.tile(v, (8,) + (1,) * (v.ndim - 1))
                for k, v in b1.items()}

    batches = [_tiled(_batch(rng, b=1, n=128)) for _ in range(steps)]

    def run(distributed):
        model = BaseSeg_AMContrast3D(
            encoder_args=enc_args, decoder_args={"decoder_stages": 2},
            cls_args=cls_args, bn_axis_name="dp" if distributed else None)
        axis = "dp" if distributed else None
        state = create_train_state(model, tx,
                                   {k: v[:1] for k, v in batches[0].items()},
                                   jax.random.PRNGKey(0))
        step = make_train_step(model, crit, tx, "aa", NCLS, None, aargs,
                               axis_name=axis)
        ev = make_eval_step(model, "aa", NCLS, axis_name=axis)
        if distributed:
            state = replicate(state, mesh)
            step = make_sharded_train_step(step, mesh)
            ev = make_sharded_eval_step(ev, mesh)
            feed = [shard_batch(b, mesh) for b in batches]
            rngk = replicate(jax.random.PRNGKey(1), mesh)
        else:
            step = jax.jit(step, donate_argnums=(0,))
            ev = jax.jit(ev)
            feed = batches
            rngk = jax.random.PRNGKey(1)
        losses, evals, params1 = [], [], None
        for _ in range(epochs):
            for b in feed:
                state, metrics = step(state, b, rngk)
                losses.append(float(metrics["loss"]))
                if params1 is None:
                    params1 = jax.device_get(state.params)
            out = ev(state, feed[0])
            evals.append((np.asarray(out["cm"]), np.asarray(out["logits"])))
        return state, losses, evals, params1

    state_s, losses_s, evals_s, params1_s = run(distributed=True)
    state_1, losses_1, evals_1, params1_1 = run(distributed=False)

    # after ONE step, every parameter matches tightly: gradients (pmean of
    # equal shard grads == global grad), SyncBN stats, clipping and the
    # adamw update all agree up to fp32 reassociation
    for a, b in zip(jax.tree_util.tree_leaves(params1_s),
                    jax.tree_util.tree_leaves(params1_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # over epochs adamw's g/sqrt(v) amplifies fp32 noise chaotically, so the
    # trajectory-level invariants are loss agreement, CM totals, and a
    # gross-divergence guard on the eval logits
    np.testing.assert_allclose(losses_s, losses_1, rtol=2e-3, atol=1e-3)
    for (cm_s, lg_s), (cm_1, lg_1) in zip(evals_s, evals_1):
        assert cm_s.sum() == cm_1.sum() == batches[0]["y"].size
        np.testing.assert_allclose(lg_s, lg_1, atol=0.01)

    # checkpoint crosses topologies: sharded state -> disk -> single-device
    class _Cfg:
        run_name = "ddp_equiv"
        ckpt_dir = str(tmp_path)

        def get(self, k, d=None):
            return d

    from amcontrast3d_tpu.utils.ckpt import load_checkpoint, save_checkpoint
    payload = {"params": state_s.params, "batch_stats": state_s.batch_stats,
               "opt_state": state_s.opt_state}
    path = save_checkpoint(_Cfg(), payload, epoch=epochs)
    template = {"params": state_1.params, "batch_stats": state_1.batch_stats,
                "opt_state": state_1.opt_state}
    restored, epoch, _ = load_checkpoint(template, path)
    assert epoch == epochs
    for a, b in zip(jax.tree_util.tree_leaves(restored["params"]),
                    jax.tree_util.tree_leaves(
                        jax.device_get(state_s.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    state_r = state_1.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"],
                              opt_state=restored["opt_state"])
    model = BaseSeg_AMContrast3D(encoder_args=enc_args,
                                 decoder_args={"decoder_stages": 2},
                                 cls_args=cls_args)
    step = jax.jit(make_train_step(model, crit, tx, "aa", NCLS, None, aargs))
    state_r, metrics = step(state_r, batches[0], jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_mm_aef_source_refinement(rng):
    """MM with ambiguity_args.source='AEF': ground-truth ambiguity drives
    the refinement (pointnext_MM.py:526-532)."""
    model = BaseSeg_M_AMContrast3D(encoder_args=ENCODER_ARGS,
                                   decoder_args={}, cls_args=CLS_ARGS,
                                   APM_args=APM_ARGS,
                                   AEF_args=dict(AARGS, source="AEF"))
    criterion = CrossEntropyAcePre()
    batch = _batch(rng)
    tx = _tx()
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, criterion, tx, "mm", NCLS, None,
                                   dict(AARGS, source="AEF")))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["refine_rate"]))


@pytest.mark.parametrize("kind", ["aa", "mm"])
def test_train_step_loss_remat_identical(rng, kind):
    """ambiguity_args.remat=True must leave the jitted train step numerically
    unchanged (same loss from the same state/batch/rng) for both families
    that route through the contrast head."""
    if kind == "aa":
        model = BaseSeg_AMContrast3D(encoder_args=ENCODER_ARGS,
                                     decoder_args={}, cls_args=CLS_ARGS)
        criterion = CrossEntropyAce()
    else:
        model = BaseSeg_M_AMContrast3D(encoder_args=ENCODER_ARGS,
                                       decoder_args={}, cls_args=CLS_ARGS,
                                       APM_args=APM_ARGS, AEF_args=AARGS)
        criterion = CrossEntropyAcePre()
    batch = _batch(rng)
    tx = _tx()
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    rngk = jax.random.PRNGKey(1)
    out = {}
    for remat in (False, True):
        aargs = dict(AARGS, remat=remat)
        step = jax.jit(make_train_step(model, criterion, tx, kind, NCLS,
                                       None, aargs))
        s2, metrics = step(state, batch, rngk)
        s2, metrics = step(s2, batch, rngk)  # 2nd step exercises the grads
        out[remat] = float(metrics["loss"])
    np.testing.assert_allclose(out[True], out[False], rtol=1e-6)


def test_train_step_adahessian_needs_hessian(rng):
    """adahessian end-to-end: the train step computes the Hutchinson
    diagonal via jvp through the full model (BN mutables included) and the
    loss still goes down."""
    model = BaseSeg(encoder_args=ENCODER_ARGS, decoder_args={},
                    cls_args=CLS_ARGS)
    criterion = CrossEntropy(label_smoothing=0.2)
    batch = _batch(rng)
    tx = build_tx({"NAME": "adahessian", "weight_decay": 1e-4}, 0.01,
                  grad_norm_clip=10.0)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, criterion, tx, "base", NCLS,
                                   None, AARGS, needs_hessian=True))
    rngk = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, rngk)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
