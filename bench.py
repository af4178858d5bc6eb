"""Benchmark: flagship AMContrast3D (AA) train-step throughput on one chip.

Measures fwd+bwd+update points/sec on the S3DIS recipe shapes
(voxel_max=24000 points/cloud, PointNeXt-XL width 64, the full
CrossEntropyAce objective incl. 4-stage kNN ambiguity + contrast) on
synthetic clouds — the BASELINE.md north-star throughput metric
(points/sec/chip, no published reference value: vs_baseline null).

Also reports (in "detail"): step wall-clock, model-FLOPs utilization
and the eval-path (inference forward) throughput at the same shapes.

MFU accounting: XLA's cost analysis reports ZERO FLOPs for custom calls,
so ``mfu_pct_lower_bound`` (XLA-counted only) undercounts.  ``mfu_pct``
adds the analytic MXU matmul FLOPs of EVERY Pallas kernel family in the
step — contrast similarity + VJP, label_vote, fused 3-NN interpolation
fwd+bwd, and (kind=mm) the DualMasks refinement — from their static
matmul shapes; kNN/ballquery/FPS kernels contain no matmuls (their
distance sweeps are VPU work, tallied in ``pallas_tflops_vpu``).  The
interp/DualMasks terms assume no chunk-pruning (bbox skipping makes the
executed work data-dependent), so mfu_pct is exact for the contrast
family and a mild upper bound for the pruned families.

Env axes: BENCH_RECIPE=s3dis|scannet, BENCH_KIND=aa|mm, BENCH_AMP=0|1,
BENCH_ITERS, BENCH_BUDGET_S (wall-clock guard, default 540 s; the
primary JSON line always prints), BENCH_CANARY=1 / BENCH_BREAKDOWN=1
(opt-in extra compiles, default off since round 4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

_T_START = time.perf_counter()  # wall-clock budget anchor (BENCH_BUDGET_S)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))

import numpy as np

# bf16 peak matmul throughput per chip (MFU denominator, the standard
# convention even for fp32-heavy programs)
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12, "TPU v5e": 197e12,
    "TPU v4": 275e12, "TPU v5p": 459e12, "TPU v6 lite": 918e12,
}


def _peak(device) -> float:
    kind = getattr(device, "device_kind", "")
    for key, val in _PEAK_FLOPS.items():
        if key.lower() in str(kind).lower():
            return val
    return 197e12


def _pallas_flops(B, N, stage_shapes, nsample, ncls=13):
    """Analytic per-step FLOPs of the fused Pallas kernel family (XLA cost
    analysis reports ZERO for custom calls, so these are invisible to the
    lower bound).  Matmul shapes are static: per contrast stage the forward
    runs one (cs, C)x(C, tq) similarity matmul over every support-chunk x
    query-tile pair (2*B*n_pad^2*C flops) and the custom VJP runs four more
    of the same shape (s recompute + w.F in each of the two bwd kernels) —
    10*B*n_pad^2*C total; label_vote adds a (cs, tq)^T x (cs, ncls) count
    matmul per stage.  VPU flops (the d^2 broadcasts of the selection +
    reduction passes, ~9 flops/pair/pass) are tallied separately — MFU
    convention counts MXU work only."""
    from amcontrast3d_tpu.ops.contrast_pallas import _shapes

    mxu = 0.0
    vpu = 0.0
    n_pad0 = _shapes(stage_shapes[0][1])[0]
    for i, (b, n, c) in enumerate(stage_shapes):
        n_pad = _shapes(n)[0]
        pairs = float(b) * n_pad * n_pad
        mxu += 10.0 * pairs * c           # fwd (2) + VJP (8) similarity work
        vpu += pairs * 9.0 * 4            # d2: selection+reduction fwd, 2 bwd
        if i > 0:                          # label_vote from stage-0 support
            m_pad = _shapes(n)[0]
            mxu += 2.0 * b * n_pad0 * m_pad * ncls
            vpu += float(b) * n_pad0 * m_pad * 9.0 * 2
    # fused 3-NN interpolation (decoder fp stages + the loss-side stage
    # upsamples): per (query stage i ← support stage i+1) one fwd
    # weight-accumulate matmul (tq,cs)x(cs,C+1) over every chunk-tile pair
    # and one bwd scatter matmul of the same shape — 4*B*Nq*Ns*(C+1) total.
    # Chunk-pruning (bbox lower bounds) skips far pairs at run time, so
    # this term is an upper bound on executed MXU work; the d2/top-3
    # selection passes are VPU (9 flops/pair fwd, once more in bwd).
    for (bq, nq, _), (bs, ns, cs_ch) in zip(stage_shapes[:-1],
                                            stage_shapes[1:]):
        qp = float(bq) * nq * ns
        mxu += 4.0 * qp * (cs_ch + 1)
        vpu += qp * 9.0 * 2
    # FPS (dense batched kernel): npoint sequential iterations, each a
    # full B x N_prev d2-update sweep over the PREVIOUS stage's cloud
    # (~9 VPU flops/lane) — no MXU work.
    for (_, n_prev, _), (_, n_s, _) in zip(stage_shapes[:-1],
                                           stage_shapes[1:]):
        vpu += 9.0 * float(B) * n_prev * n_s  # npoint == next stage size
    return mxu, vpu


def _dualmasks_flops(B, N, C):
    """MM refinement (DualMasks) analytic FLOPs: the fused kernel runs at
    FULL resolution — fwd one 0/1-weight matmul (tq,cs)x(cs,C+1) per
    chunk-tile pair over the whole (n_pad x n_pad) grid, bwd one (cs,C)
    more (ops/contrast_pallas.py:_refine_fwd_kernel/_refine_bwd_kernel).
    Membership selection (d2 + threshold + MIN-fusion sweeps, 3 passes) is
    VPU.  Upper bound: bbox chunk-pruning skips far pairs at run time."""
    from amcontrast3d_tpu.ops.contrast_pallas import _shapes

    n_pad = _shapes(N)[0]
    pairs = float(B) * n_pad * n_pad
    return 2.0 * pairs * (2 * C + 1), pairs * 9.0 * 3


def _device_canary():
    """Fast compiled-kernel canary (VERDICT r2 weak #6): one kNN-recall
    assert + one fused-loss-vs-XLA assert at small shapes, so every bench
    run guards Mosaic regressions.  Raises (bench exits non-zero) on
    failure; returns a status string."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return "skipped (not on tpu)"

    from amcontrast3d_tpu.loss import contrast as C
    from amcontrast3d_tpu.loss.aef import one_hot_labels
    from amcontrast3d_tpu.ops.knn import set_knn_backend
    from amcontrast3d_tpu.ops.knn_pallas import knn_pallas

    rng = np.random.RandomState(0)

    # 1. compiled large-N kNN recall vs the exact top-k oracle
    sup = jnp.asarray(rng.rand(1, 24000, 3).astype(np.float32) * 4)
    q = sup[:, :1024]
    k = 24
    idx, _ = jax.block_until_ready(knn_pallas(sup, q, k))
    d2 = jnp.sum((q[:, :, None, :] - sup[:, None, :, :]) ** 2, -1)
    oracle = jax.lax.top_k(-d2, k)[1]
    hits = 0
    a, o = np.asarray(idx)[0], np.asarray(oracle)[0]
    for ai, oi in zip(a, o):
        hits += len(set(ai.tolist()) & set(oi.tolist()))
    recall = hits / a.size
    assert recall >= 0.995, f"canary: compiled kNN recall {recall:.4f} < 0.995"

    # 2. fused contrast loss+grad vs the exact XLA gather path
    args = dict(nsample=24, ccbeta=0.04, cctype="Method2", temperature=0.3,
                supervisedCL="Method1", db="-m", margin="adaptive", mu=-1,
                nu=0.5, fused_precision="highest")
    p = jnp.asarray(rng.rand(2, 4096, 3).astype(np.float32) * 4)
    f = jnp.asarray(rng.randn(2, 4096, 32).astype(np.float32))
    y = jnp.asarray(rng.randint(0, 13, (2, 4096)).astype(np.int32))
    labels = one_hot_labels(y, 13, None)
    set_knn_backend("exact")
    try:
        lf, gf = jax.jit(jax.value_and_grad(
            lambda f_: C.point_contrast_margin_fused(p, f_, labels, args)[0]))(f)

        def loss_xla(f_):
            C.set_fused_contrast("off")
            try:
                return C.point_contrast_margin(p, f_, labels, args)[0]
            finally:
                C.set_fused_contrast("auto")

        lx, gx = jax.jit(jax.value_and_grad(loss_xla))(f)
    finally:
        set_knn_backend("auto")
    lf, lx = float(lf), float(lx)
    assert abs(lf - lx) <= 1e-4 + 1e-3 * abs(lx), \
        f"canary: fused loss {lf} vs xla {lx}"
    gf, gx = np.asarray(gf), np.asarray(gx)
    cos = float((gf * gx).sum() /
                (np.linalg.norm(gf) * np.linalg.norm(gx) + 1e-30))
    assert cos >= 0.999, f"canary: fused/xla grad cosine {cos:.5f}"
    return f"ok (knn recall {recall:.4f}, grad cos {cos:.5f})"


def main():
    import jax

    # honor an explicit JAX_PLATFORMS=cpu BEFORE first backend touch (the
    # container sitecustomize force-registers the remote-TPU plugin, which
    # otherwise wins — and a stray CPU-intended bench run would land on
    # the shared chip)
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: configured by amcontrast3d_tpu/__init__.py
    # (explicit jax.config.update — the env-var route alone never writes on
    # this platform).  The setdefault at the top of this file only pins the
    # cache DIRECTORY before that import runs.  With a warm cache the
    # ~10-min flagship AOT compile becomes seconds, so the driver's
    # budgeted run completes.

    # Probe the backend before any compile: a wedged/unavailable remote
    # chip otherwise surfaces as a bare stack trace.  Emit a machine-
    # readable failure line and exit non-zero instead.
    try:
        jax.devices()
    except Exception as e:  # RuntimeError on axon; be permissive here
        print(json.dumps({
            "metric": "train_points_per_sec_per_chip", "value": None,
            "unit": "points/s", "vs_baseline": None,
            "error": f"accelerator unavailable: {e}"}))
        sys.exit(3)

    from __graft_entry__ import AMBIGUITY_ARGS, _batch, _flagship_cfg
    from amcontrast3d_tpu.engine import (build_tx, create_train_state,
                                         make_predict_step, make_train_step)
    from amcontrast3d_tpu.loss import CrossEntropyAce
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D
    from amcontrast3d_tpu.scheduler import (as_step_schedule,
                                            build_scheduler_from_cfg)

    # BENCH_RECIPE=scannet → the ScanNet flagship recipe shapes/params
    # (cfgs/scannet/AMContrast3D-AA.yaml: batch 2 × voxel_max 64000,
    # in_channels 7, radius 0.05, 20 classes, ignore_index -100, ν=0.6,
    # temperature=0.5); default stays the S3DIS recipe.
    recipe = os.environ.get("BENCH_RECIPE", "s3dis")
    scannet = recipe == "scannet"
    B = int(os.environ.get("BENCH_BATCH", 2 if scannet else 4))
    N = int(os.environ.get("BENCH_POINTS", 64000 if scannet else 24000))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    in_ch, ncls, ignore_index = (7, 20, -100) if scannet else (4, 13, None)

    # Wall-clock budget: the driver runs `python bench.py` under a hard
    # timeout (round 3's run was killed at rc=124 with zero output).  The
    # guard guarantees the primary JSON line prints: enrichments (eval
    # path, CE-only breakdown, second pipelined trial) are skipped and the
    # timing iters shrink as the remaining budget demands.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 540))

    def _left():
        return budget_s - (time.perf_counter() - _T_START)

    # Device canary + CE-breakdown are opt-in (each costs extra full
    # compiles; the canary lives in tests_device/ for routine runs).
    canary = "disabled"
    if os.environ.get("BENCH_CANARY", "0") != "0":
        canary = _device_canary()  # raises (non-zero exit) on regression

    import jax.numpy as _jnp

    # BENCH_AMP=1 → bf16 model dtype (the use_amp recipe axis; the
    # reference default recipe is fp32, cfgs/default.yaml:46, so the
    # headline number stays fp32 unless the env says otherwise)
    amp = os.environ.get("BENCH_AMP", "0") != "0"
    dtype = _jnp.bfloat16 if amp else _jnp.float32
    encoder_args, cls_args = _flagship_cfg()
    if scannet:
        encoder_args.update(in_channels=in_ch, radius=0.05)
        cls_args.update(num_classes=ncls, global_feat="max")
    # BENCH_KIND=mm → the AMContrast3D++ flagship (APM towers + DualMasks
    # refinement + 4-term CrossEntropyAcePre), cfgs/s3dis/AMContrast3D-MM.yaml
    kind = os.environ.get("BENCH_KIND", "aa")
    ambiguity_args = dict(AMBIGUITY_ARGS)
    if scannet:
        ambiguity_args.update(nu=0.6, temperature=0.5)
    # BENCH_REMAT=1 → loss-side rematerialization (ambiguity_args.remat):
    # the memory lever that fits B=8/chip at flagship shapes (README
    # 'Selective rematerialization')
    if os.environ.get("BENCH_REMAT", "0") != "0":
        ambiguity_args["remat"] = True
    if kind == "mm":
        from amcontrast3d_tpu.loss import CrossEntropyAcePre
        from amcontrast3d_tpu.models import BaseSeg_M_AMContrast3D

        apm_args = {"NAME": "APM_pf_ConCate",
                    "feature_dim": [64, 128, 256, 512],
                    "linear_mapping": False, "cross_attention": False,
                    "feat_concate": False,
                    "channel": [32, 16, 8, 4, 2], "dropout": [0, 0, 0, 0, 0],
                    "nsample_k": 12, "threshold": 0.9, "threshold_max": 1.0,
                    "gamma": 1, "fusion": "MIN", "att_dim": 3}
        ambiguity_args.update(source="APM", source_mode="Train")
        model = BaseSeg_M_AMContrast3D(
            encoder_args=encoder_args, decoder_args={}, cls_args=cls_args,
            AEF_args=ambiguity_args, APM_args=apm_args, dtype=dtype)
        criterion = CrossEntropyAcePre()
    else:
        model = BaseSeg_AMContrast3D(encoder_args=encoder_args,
                                     decoder_args={}, cls_args=cls_args,
                                     dtype=dtype)
        criterion = CrossEntropyAce()
    lr_fn, _ = build_scheduler_from_cfg({"sched": "cosine", "epochs": 150,
                                         "lr": 0.01, "min_lr": 1e-5})
    tx = build_tx({"NAME": "adamw", "weight_decay": 1e-4},
                  as_step_schedule(lr_fn, 100), grad_norm_clip=10.0)

    batch = _batch(B, N, in_ch=in_ch, ncls=ncls)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criterion, tx, kind, ncls, ignore_index,
                              ambiguity_args)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    rngk = jax.random.PRNGKey(1)

    # AOT-compile once; the same executable provides the XLA FLOPs estimate
    # for MFU and runs the timing loop (no duplicate 10-minute compile).
    step = jit_step.lower(state, batch, rngk).compile()
    flops = None
    try:
        cost = step.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    t0 = time.perf_counter()
    state, metrics = step(state, batch, rngk)
    _ = float(metrics["loss"])
    step_est = time.perf_counter() - t0  # warmup step ≈ synced step cost

    # Budget-aware iteration count: the timing below runs ~3*iters steps
    # (one synced trial + up to two pipelined trials); leave headroom for
    # the eval-path enrichment.  Guarantees the primary line prints even
    # on a cold cache that ate most of the budget in the AOT compile.
    max_iters = int(max(2, (_left() - 60.0) / (3.0 * step_est + 1e-9)))
    iters = max(2, min(iters, max_iters))

    # Synced timing: a host-side scalar fetch per iteration (each fetch
    # pays a full tunnel roundtrip on the remote-TPU platform;
    # block_until_ready alone under-reports, so this is the conservative
    # per-step wall-clock incl. the round trip).
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rngk)
        _ = float(metrics["loss"])
    dt_synced = (time.perf_counter() - t0) / iters

    # Pipelined timing — the steady-state training number: enqueue all
    # steps and fetch one scalar at the end.  The steps are sequentially
    # dependent on device (opt state chains through donated buffers), so
    # the elapsed time covers every step's execution; a real training
    # epoch runs exactly like this (the loss meter read is per-log-freq,
    # and only the remote tunnel makes a scalar fetch expensive).
    dt = None
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, batch, rngk)
        _ = float(metrics["loss"])
        trial = (time.perf_counter() - t0) / iters
        dt = trial if dt is None else min(dt, trial)
        if _left() < 45.0:  # one trial is enough if the budget is tight
            break

    detail = {"batch": B, "points": N, "kind": kind, "recipe": recipe,
              "step_ms": round(dt * 1e3, 2),
              "step_ms_synced": round(dt_synced * 1e3, 2),
              "device": str(jax.devices()[0]),
              "loss": float(metrics["loss"]), "canary": canary,
              "dtype": "bfloat16" if amp else "float32"}

    # analytic Pallas FLOPs: the fused contrast/vote kernels are custom
    # calls (zero in XLA cost analysis); their matmul shapes are static, so
    # the true model FLOPs are XLA's count plus the analytic kernel count
    try:
        out_sh = jax.eval_shape(
            lambda v, pp, xx: model.apply(v, pp, xx, training=False),
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos"], batch["x"])
        stages_sh = out_sh[1]
        stage_shapes = [tuple(s.shape) for s in stages_sh["f_up"]]
        mxu_fl, vpu_fl = _pallas_flops(B, N, stage_shapes,
                                       ambiguity_args["nsample"], ncls=ncls)
        if kind == "mm":  # DualMasks refinement runs at full resolution
            dm_mxu, dm_vpu = _dualmasks_flops(B, N, stage_shapes[0][2])
            mxu_fl += dm_mxu
            vpu_fl += dm_vpu
        detail["pallas_tflops_mxu"] = round(mxu_fl / 1e12, 2)
        detail["pallas_tflops_vpu"] = round(vpu_fl / 1e12, 2)
    except Exception:
        mxu_fl = vpu_fl = 0.0
    peak = _peak(jax.devices()[0])
    if flops:
        # XLA cost analysis reports zero FLOPs for custom calls, so the
        # Pallas kernels' internal matmuls are NOT counted — this is a
        # lower bound.  Point-cloud segmentation is neighbor-op/VPU-bound,
        # so MFU is inherently low; points/s is the meaningful metric.
        detail["xla_tflops_excl_custom_calls"] = round(flops / 1e12, 2)
        detail["mfu_pct_lower_bound"] = round(flops / dt / peak * 100.0, 2)
        if mxu_fl:
            # the honest MFU: XLA-counted FLOPs + analytic Pallas matmul
            # FLOPs.  The VPU fraction (distance broadcasts, selection
            # tournaments) does not count toward MXU utilization — this
            # program is neighbor-op/VPU+HBM-bound by nature.
            detail["mfu_pct"] = round(
                (flops + mxu_fl) / dt / peak * 100.0, 2)

    # eval-path (inference forward) throughput at the same shapes.  Fetch a
    # scalar reduction, not the logits: on the remote-TPU platform a 5 MB
    # device→host copy costs ~200 ms and would swamp the compute time.
    # Skipped when the wall-clock budget is nearly spent (it costs another
    # compile); the primary train line must print first.
    try:
        if _left() < 75.0:
            raise TimeoutError("budget")
        import jax.numpy as jnp

        predict = make_predict_step(model)
        # chain iterations through a device-side accumulator so one final
        # scalar fetch proves every enqueued forward executed (pipelined,
        # same rationale as the train loop)
        pred_acc = jax.jit(lambda acc, s, b: acc + jnp.sum(predict(s, b)))
        ebatch = {"pos": batch["pos"], "x": batch["x"]}
        acc = pred_acc(jnp.float32(0), state, ebatch)
        _ = float(acc)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = pred_acc(acc, state, ebatch)
        _ = float(acc)
        edt = (time.perf_counter() - t0) / iters
        detail["eval_points_per_sec"] = round(B * N / edt, 1)
        detail["eval_step_ms"] = round(edt * 1e3, 2)
    except Exception:
        pass

    # encoder/decoder-vs-loss breakdown: a CE-only step (same model, same
    # optimizer, contrast head elided) isolates the encoder+decoder+update
    # cost; the contrast objective is the difference (↔ the grouper
    # micro-bench role of reference examples/profile.py:108-126)
    if (kind == "aa" and os.environ.get("BENCH_BREAKDOWN", "0") != "0"
            and _left() > 120.0):
        try:
            from amcontrast3d_tpu.loss import CrossEntropy

            plain_ce = CrossEntropy()

            class _CEOnly:
                def __call__(self, logits, target, up_stages, nc, ii, args):
                    return args["w1"] * plain_ce(logits, target)

            ce_step = jax.jit(
                make_train_step(model, _CEOnly(), tx, "aa", ncls,
                                ignore_index, ambiguity_args),
                donate_argnums=(0,))
            ce_state = create_train_state(model, tx, batch,
                                          jax.random.PRNGKey(0))
            ce_state, m2 = ce_step(ce_state, batch, rngk)
            _ = float(m2["loss"])
            # pipelined like the main loop (donated state chains steps),
            # so the encoder/loss split compares like with like
            t0 = time.perf_counter()
            for _ in range(iters):
                ce_state, m2 = ce_step(ce_state, batch, rngk)
            _ = float(m2["loss"])
            cdt = (time.perf_counter() - t0) / iters
            del ce_state
            detail["breakdown_ms"] = {
                "encoder_decoder_opt": round(cdt * 1e3, 2),
                "contrast_objective": round((dt - cdt) * 1e3, 2),
            }
        except Exception:
            pass

    pts_per_sec = B * N / dt
    # Projected epoch wall-clock (BASELINE.json north-star #3; no published
    # reference value).  Epoch sample counts from the reference recipes:
    # S3DIS train = 204 rooms (all areas but 5) x loop 30 = 6120 clouds of
    # voxel_max 24000 (cfgs/s3dis/default.yaml:10-11); ScanNet train = 1201
    # scenes x loop 6 = 7206 clouds of voxel_max 64000
    # (cfgs/scannet/default.yaml:6-10).
    epoch_clouds = 7206 if scannet else 6120
    detail["projected_epoch_s_1chip"] = round(epoch_clouds * N / pts_per_sec,
                                              1)
    result = {
        "metric": "train_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": None,
        "detail": detail,
    }
    # Cross-round memory: the reference publishes no throughput number
    # (vs_baseline stays null), so compare against the previous round's
    # driver-recorded BENCH_r*.json — a silent regression becomes visible
    # in the artifact itself.  Only the default axis is comparable (the
    # driver always runs with default env).
    if (recipe, kind, amp) == ("s3dis", "aa", False):
        prev = _prev_round_value()
        if prev is not None:
            n_prev, v_prev = prev
            result["vs_prev_round"] = round(pts_per_sec / v_prev, 4)
            detail["prev_round"] = {"n": n_prev, "value": v_prev}
    print(json.dumps(result))


def _prev_round_value():
    """(round_n, points/s) from the newest parseable BENCH_r*.json."""
    import glob
    import re
    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            val = (rec.get("parsed") or {}).get("value")
        except Exception:
            continue
        if val and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), float(val))
    return best


if __name__ == "__main__":
    main()
