"""Update-rule parity for the reference's vendored optimizers.

The oracles here are the ACTUAL torch implementations: the reference's
adamp/sgdp/madgrad/lookahead classes (loaded from /root/reference when
present) and torch's own ReduceLROnPlateau for the plateau scheduler — not
hand-written re-transcriptions.
"""
import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from amcontrast3d_tpu.optim import build_optimizer_from_cfg
from amcontrast3d_tpu.optim.extras import (adamp, lookahead, madgrad,
                                           scale_by_layer_decay, sgdp,
                                           vit_layer_id)
from amcontrast3d_tpu.scheduler import build_scheduler_from_cfg
from amcontrast3d_tpu.scheduler.plateau_lr import (PlateauScheduler,
                                                   scale_by_plateau,
                                                   set_plateau_scale)

REF_OPTIM = "/root/reference/openpoints/optim"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_OPTIM),
                               reason="reference checkout not available")


def _load_ref(name):
    if "refoptim" not in sys.modules:
        pkg = types.ModuleType("refoptim")
        pkg.__path__ = [REF_OPTIM]
        sys.modules["refoptim"] = pkg
    full = f"refoptim.{name}"
    if full in sys.modules:
        return sys.modules[full]
    spec = importlib.util.spec_from_file_location(
        full, os.path.join(REF_OPTIM, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod


SHAPES = [(8, 4), (16,), (5, 7), (3, 3, 4, 6)]
N_STEPS = 6


def _make_data(seed=0):
    rng = np.random.RandomState(seed)
    params = [rng.randn(*s).astype(np.float32) * 0.5 for s in SHAPES]
    grads = [[rng.randn(*s).astype(np.float32) for s in SHAPES]
             for _ in range(N_STEPS)]
    return params, grads


def _run_jax(tx, params, grads):
    p = [jnp.asarray(x) for x in params]
    state = tx.init(p)
    for g in grads:
        upd, state = tx.update([jnp.asarray(x) for x in g], state, p)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
    return [np.asarray(x) for x in p]


def _run_torch(opt_factory, params, grads, weight_decay):
    import torch
    tp = [torch.nn.Parameter(torch.tensor(x)) for x in params]
    # reference runs with filter_bias_and_bn: 1-d params get wd=0
    # (optim_factory.py:66-81)
    decay = [p for p in tp if p.ndim > 1]
    no_decay = [p for p in tp if p.ndim <= 1]
    opt = opt_factory([{"params": decay, "weight_decay": weight_decay},
                       {"params": no_decay, "weight_decay": 0.0}])
    for g in grads:
        for p, gr in zip(tp, g):
            p.grad = torch.tensor(gr)
        opt.step()
    return [p.detach().numpy() for p in tp]


@needs_ref
@pytest.mark.parametrize("nesterov", [False, True])
def test_adamp_matches_reference(nesterov):
    ref = _load_ref("adamp")
    params, grads = _make_data(1)
    wd = 0.05
    ours = _run_jax(adamp(1e-2, weight_decay=wd, wd_ratio=0.01,
                          nesterov=nesterov), params, grads)
    theirs = _run_torch(
        lambda groups: ref.AdamP(groups, lr=1e-2, wd_ratio=0.01,
                                 nesterov=nesterov),
        params, grads, wd)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=3e-6, rtol=1e-5)


@needs_ref
@pytest.mark.parametrize("nesterov", [False, True])
def test_sgdp_matches_reference(nesterov):
    _load_ref("adamp")
    ref = _load_ref("sgdp")
    params, grads = _make_data(2)
    wd = 0.05
    ours = _run_jax(sgdp(1e-2, momentum=0.9, weight_decay=wd,
                         nesterov=nesterov), params, grads)
    theirs = _run_torch(
        lambda groups: ref.SGDP(groups, lr=1e-2, momentum=0.9,
                                nesterov=nesterov),
        params, grads, wd)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=3e-6, rtol=1e-5)


@needs_ref
@pytest.mark.parametrize("momentum,decoupled", [(0.0, False), (0.9, False),
                                                (0.9, True)])
def test_madgrad_matches_reference(momentum, decoupled):
    ref = _load_ref("madgrad")
    params, grads = _make_data(3)
    wd = 0.02
    ours = _run_jax(madgrad(1e-2, momentum=momentum, weight_decay=wd,
                            decoupled_decay=decoupled), params, grads)
    theirs = _run_torch(
        lambda groups: ref.MADGRAD(groups, lr=1e-2, momentum=momentum,
                                   decoupled_decay=decoupled),
        params, grads, wd)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b, atol=5e-6, rtol=1e-5)


@needs_ref
def test_lookahead_matches_reference():
    import torch
    ref = _load_ref("lookahead")
    params, grads = _make_data(4)
    ours = _run_jax(lookahead(optax.sgd(1e-2), alpha=0.5, k=3),
                    params, grads)

    tp = [torch.nn.Parameter(torch.tensor(x)) for x in params]
    base = torch.optim.SGD(tp, lr=1e-2)
    opt = ref.Lookahead(base, alpha=0.5, k=3)
    for g in grads:
        for p, gr in zip(tp, g):
            p.grad = torch.tensor(gr)
        opt.step()
    for a, p in zip(ours, tp):
        np.testing.assert_allclose(a, p.detach().numpy(), atol=3e-6,
                                   rtol=1e-5)


def test_plateau_matches_torch_reduce_on_plateau():
    """Our host-side plateau vs torch's ReduceLROnPlateau over a metric
    trace with improvements, stalls, cooldown and min_lr clamping."""
    import torch
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(lin.parameters(), lr=0.1)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", factor=0.5, patience=2, threshold=1e-2,
        cooldown=1, min_lr=0.01)
    ours = PlateauScheduler(base_lr=0.1, mode="max", decay_rate=0.5,
                            patience_t=2, threshold=1e-2, cooldown_t=1,
                            lr_min=0.01)
    metrics = [1.0, 2.0, 2.0, 2.0, 2.0, 2.005, 2.1, 2.1, 2.1, 2.1, 2.1,
               2.1, 2.1, 2.1, 2.1, 2.1, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0]
    for m in metrics:
        tsched.step(m)
        scale = ours.step(m)
        torch_lr = opt.param_groups[0]["lr"]
        assert np.isclose(scale * 0.1, torch_lr), (m, scale * 0.1, torch_lr)


def test_scale_by_plateau_transform_and_setter():
    tx = optax.chain(optax.sgd(0.1), scale_by_plateau())
    params = {"w": jnp.ones((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((3,))}
    upd, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.1, rtol=1e-6)
    state = set_plateau_scale(state, 0.25)
    upd, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(upd["w"]), -0.025, rtol=1e-6)


def test_plateau_scheduler_cfg_wires_host_scheduler():
    fn, epochs = build_scheduler_from_cfg(
        {"sched": "plateau", "epochs": 10, "lr": 0.1, "min_lr": 0.0,
         "decay_rate": 0.5, "patience_epochs": 1})
    assert epochs == 10
    assert float(fn(3)) == pytest.approx(0.1)
    assert fn.plateau is not None
    assert fn.plateau.step(1.0) == 1.0


def test_layer_decay_scales():
    ld, num_layers = 0.75, 4
    tx = scale_by_layer_decay(ld, num_layers)
    updates = {"encoder": {"cls_token": jnp.ones(()),
                           "block0": {"w": jnp.ones(())},
                           "block3": {"w": jnp.ones(())}},
               "head": {"w": jnp.ones(())}}
    out, _ = tx.update(updates, tx.init(updates))
    assert float(out["encoder"]["cls_token"]) == pytest.approx(ld ** 5)
    assert float(out["encoder"]["block0"]["w"]) == pytest.approx(ld ** 4)
    assert float(out["encoder"]["block3"]["w"]) == pytest.approx(ld ** 1)
    assert float(out["head"]["w"]) == pytest.approx(1.0)
    # id mapping mirrors get_num_layer_for_vit (optim_factory.py:37-52)
    assert vit_layer_id("encoder.pos_embed", 6) == 0
    assert vit_layer_id("encoder.block2.attn.w", 6) == 3
    assert vit_layer_id("norm.scale", 6) == 5


@pytest.mark.parametrize("name", ["adamp", "sgdp", "madgrad", "madgradw",
                                  "lookahead_adamw", "lookahead_sgd"])
def test_factory_builds_new_names(name):
    tx = build_optimizer_from_cfg({"NAME": name, "weight_decay": 1e-4},
                                  lr=1e-3)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    state = tx.init(params)
    g = {"w": jnp.ones((4, 3)), "b": jnp.ones((3,))}
    upd, _ = tx.update(g, state, params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(upd))


def test_factory_layer_decay_chain():
    tx = build_optimizer_from_cfg(
        {"NAME": "adamw", "layer_decay": 0.9, "num_layers": 2}, lr=1e-3)
    params = {"encoder": {"block0": {"w": jnp.ones((2, 2))}},
              "head": {"w": jnp.ones((2, 2))}}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    upd, _ = tx.update(g, state, params)
    ratio = (np.abs(np.asarray(upd["encoder"]["block0"]["w"])).mean() /
             np.abs(np.asarray(upd["head"]["w"])).mean())
    assert ratio == pytest.approx(0.9 ** 2, rel=1e-3)


# ---------------------------------------------------------------------------
# adahessian
# ---------------------------------------------------------------------------

@needs_ref
def test_adahessian_update_rule_matches_torch():
    """Feed identical grad/hess sequences to the reference torch Adahessian
    (HVP machinery bypassed — p.hess set directly) and the optax transform;
    the parameter trajectories must match."""
    torch = pytest.importorskip("torch")
    mod = _load_ref("adahessian")
    from amcontrast3d_tpu.optim.adahessian import adahessian

    params, grads = _make_data(3)
    rng = np.random.RandomState(99)
    hesses = [[rng.rand(*s).astype(np.float32) * 2 for s in SHAPES]
              for _ in range(N_STEPS)]

    kw = dict(lr=0.01, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.05,
              hessian_power=1.0)
    tparams = [torch.nn.Parameter(torch.tensor(p)) for p in params]
    opt = mod.Adahessian(tparams, **kw)
    # bypass set_hessian/zero_hessian (they would need a retained torch
    # graph): hessian step 1 with a huge update_each keeps p.hess as set
    opt.update_each = 10 ** 9
    for p in opt.get_params():
        opt.state[p]["hessian step"] = 1
    for g_step, h_step in zip(grads, hesses):
        for p, g, h in zip(tparams, g_step, h_step):
            p.grad = torch.tensor(g)
            p.hess = torch.tensor(h)
        opt.step()

    tx = adahessian(kw["lr"], b1=0.9, b2=0.999, eps=kw["eps"],
                    weight_decay=kw["weight_decay"], hessian_power=1.0,
                    mask=None)
    jparams = [jnp.array(p) for p in params]
    st = tx.init(jparams)
    for g_step, h_step in zip(grads, hesses):
        upd, st = tx.update([jnp.array(g) for g in g_step], st, jparams,
                            hess=[jnp.array(h) for h in h_step])
        jparams = optax.apply_updates(jparams, upd)

    for tp, jp in zip(tparams, jparams):
        np.testing.assert_allclose(tp.detach().numpy(), np.asarray(jp),
                                   rtol=2e-5, atol=2e-6)


def test_hutchinson_diag_exact_for_diagonal_quadratic():
    """For f(x) = ½ xᵀ D x with diagonal D, z ⊙ (Hz) = z² ⊙ d = d exactly
    for every Rademacher probe."""
    from amcontrast3d_tpu.optim.adahessian import hutchinson_diag

    d = {"a": jnp.array([1.0, 2.5, -3.0, 0.5]),
         "b": jnp.array([[4.0, 0.25], [1.5, -2.0]])}
    x = {"a": jnp.ones(4), "b": jnp.ones((2, 2))}
    loss = lambda p: 0.5 * sum(jnp.sum(dd * p[k] ** 2)
                               for k, dd in d.items())
    est = hutchinson_diag(jax.grad(loss), x, jax.random.PRNGKey(0),
                          n_samples=1)
    for k in d:
        np.testing.assert_allclose(np.asarray(est[k]), np.asarray(d[k]),
                                   rtol=1e-6)


def test_factory_builds_adahessian_and_chain_forwards_hess():
    """Registry surface 15/15: the factory builds adahessian, and the
    grad-clip chain used by build_tx forwards the hess extra-arg."""
    from amcontrast3d_tpu.engine import build_tx

    tx = build_tx({"NAME": "adahessian", "weight_decay": 1e-4}, 1e-3,
                  grad_norm_clip=10.0)
    params = {"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}
    state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)
    h = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 2.0), params)
    upd, _ = tx.update(g, state, params, hess=h)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(upd))


def test_adahessian_end_to_end_quadratic_converges():
    """Full wiring: jvp-based Hutchinson + transform minimizes a quadratic."""
    from amcontrast3d_tpu.optim.adahessian import adahessian, hutchinson_diag

    d = jnp.array([1.0, 4.0, 9.0, 16.0])
    loss = lambda p: 0.5 * jnp.sum(d * p ** 2)
    tx = adahessian(0.2, weight_decay=0.0)
    p = jnp.ones(4)
    st = tx.init(p)
    key = jax.random.PRNGKey(1)
    for i in range(120):
        g = jax.grad(loss)(p)
        h = hutchinson_diag(jax.grad(loss), p, jax.random.fold_in(key, i))
        upd, st = tx.update(g, st, p, hess=h)
        p = optax.apply_updates(p, upd)
    assert float(loss(p)) < 1e-3
