"""Benchmark: flagship AMContrast3D (AA) train-step throughput on one chip.

Measures fwd+bwd+update points/sec on the S3DIS recipe shapes
(voxel_max=24000 points/cloud, PointNeXt-XL width 64, the full
CrossEntropyAce objective incl. 4-stage kNN ambiguity + contrast) on
synthetic clouds — the BASELINE.md north-star throughput metric
(points/sec/chip, no published reference value: vs_baseline null).

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


def main():
    import jax

    from __graft_entry__ import AMBIGUITY_ARGS, _batch, _flagship_cfg
    from amcontrast3d_tpu.engine import (build_tx, create_train_state,
                                         make_train_step)
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
    step = jax.jit(make_train_step(model, criterion, tx, "aa", 13, None,
                                   AMBIGUITY_ARGS), donate_argnums=(0,))
    rngk = jax.random.PRNGKey(1)

    # warmup / compile
    state, metrics = step(state, batch, rngk)
    _ = float(metrics["loss"])

    # Force a host-side value fetch per iteration: on the experimental
    # remote-TPU platform, block_until_ready alone under-reported step time.
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rngk)
        _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    pts_per_sec = B * N / dt
    result = {
        "metric": "train_points_per_sec_per_chip",
        "value": round(pts_per_sec, 1),
        "unit": "points/s",
        "vs_baseline": None,
        "detail": {"batch": B, "points": N, "step_ms": round(dt * 1e3, 2),
                   "device": str(jax.devices()[0]),
                   "loss": float(metrics["loss"])},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
