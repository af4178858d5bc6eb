"""Benchmark: flagship AMContrast3D (AA) train-step throughput on one chip.

Measures fwd+bwd+update points/sec on the S3DIS recipe shapes
(voxel_max=24000 points/cloud, PointNeXt-XL width 64, the full
CrossEntropyAce objective incl. 4-stage kNN ambiguity + contrast) on
synthetic clouds — the BASELINE.md north-star throughput metric
(points/sec/chip, no published reference value: vs_baseline null).

Also reports (in "detail"): step wall-clock, model-FLOPs utilization
(XLA cost-analysis FLOPs ÷ step time ÷ chip peak) and the eval-path
(inference forward) throughput at the same shapes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

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


def main():
    import jax

    from __graft_entry__ import AMBIGUITY_ARGS, _batch, _flagship_cfg
    from amcontrast3d_tpu.engine import (build_tx, create_train_state,
                                         make_predict_step, make_train_step)
    from amcontrast3d_tpu.loss import CrossEntropyAce
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D
    from amcontrast3d_tpu.scheduler import (as_step_schedule,
                                            build_scheduler_from_cfg)

    B = int(os.environ.get("BENCH_BATCH", 4))
    N = int(os.environ.get("BENCH_POINTS", 24000))
    iters = int(os.environ.get("BENCH_ITERS", 10))

    encoder_args, cls_args = _flagship_cfg()
    model = BaseSeg_AMContrast3D(encoder_args=encoder_args, decoder_args={},
                                 cls_args=cls_args)
    criterion = CrossEntropyAce()
    lr_fn, _ = build_scheduler_from_cfg({"sched": "cosine", "epochs": 150,
                                         "lr": 0.01, "min_lr": 1e-5})
    tx = build_tx({"NAME": "adamw", "weight_decay": 1e-4},
                  as_step_schedule(lr_fn, 100), grad_norm_clip=10.0)

    batch = _batch(B, N)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criterion, tx, "aa", 13, None,
                              AMBIGUITY_ARGS)
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
    state, metrics = step(state, batch, rngk)
    _ = float(metrics["loss"])

    # Force a host-side value fetch per iteration: on the experimental
    # remote-TPU platform, block_until_ready alone under-reported step time.
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rngk)
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    detail = {"batch": B, "points": N, "step_ms": round(dt * 1e3, 2),
              "device": str(jax.devices()[0]),
              "loss": float(metrics["loss"])}
    if flops:
        # XLA cost analysis reports zero FLOPs for custom calls, so the
        # Pallas kernels' internal matmuls are NOT counted — this is a
        # lower bound.  Point-cloud segmentation is neighbor-op/VPU-bound,
        # so MFU is inherently low; points/s is the meaningful metric.
        detail["xla_tflops_excl_custom_calls"] = round(flops / 1e12, 2)
        detail["mfu_pct_lower_bound"] = round(
            flops / dt / _peak(jax.devices()[0]) * 100.0, 2)

    # eval-path (inference forward) throughput at the same shapes.  Fetch a
    # scalar reduction, not the logits: on the remote-TPU platform a 5 MB
    # device→host copy costs ~200 ms and would swamp the compute time.
    try:
        import jax.numpy as jnp

        predict = make_predict_step(model)
        pred_sum = jax.jit(lambda s, b: jnp.sum(predict(s, b)))
        ebatch = {"pos": batch["pos"], "x": batch["x"]}
        _ = float(pred_sum(state, ebatch))
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(pred_sum(state, ebatch))
        edt = (time.perf_counter() - t0) / iters
        detail["eval_points_per_sec"] = round(B * N / edt, 1)
        detail["eval_step_ms"] = round(edt * 1e3, 2)
    except Exception:
        pass

    pts_per_sec = B * N / dt
    result = {
        "metric": "train_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": None,
        "detail": detail,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
