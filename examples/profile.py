"""Model profiler — params (M), GFLOPs, throughput (ins/s).

↔ reference ``examples/profile.py:22-126`` (deepspeed flops profiler + timed
loop); TPU-native: FLOPs come from XLA's own cost analysis of the compiled
executable (``jit(...).lower().compile().cost_analysis()``), throughput from
a timed loop with ``block_until_ready`` instead of cuda synchronize.

Usage:
    python examples/profile.py --cfg cfgs/s3dis/AMContrast3D-AA.yaml \
        [batch_size=4 num_points=24000 n_runs=20]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def profile_model(cfg, batch_size=4, num_points=24000, n_runs=20):
    import jax
    import jax.numpy as jnp

    from amcontrast3d_tpu.models import build_model_from_cfg

    model = build_model_from_cfg(dict(cfg.model))
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(batch_size, num_points, 3).astype(np.float32) * 4)
    in_ch = int(cfg.model.encoder_args.in_channels)
    x = jnp.asarray(rng.rand(batch_size, num_points, in_ch).astype(np.float32))

    variables = model.init({"params": jax.random.PRNGKey(0)}, pos, x,
                           training=False)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(variables["params"]))

    def fwd(variables, pos, x):
        out = model.apply(variables, pos, x, training=False)
        return out[0] if isinstance(out, tuple) else out

    jitted = jax.jit(fwd)
    lowered = jitted.lower(variables, pos, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    flops = cost.get("flops", float("nan"))

    out = jitted(variables, pos, x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = jitted(variables, pos, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_runs
    throughput = batch_size / dt

    print(f"params: {n_params / 1e6:.4f} M")
    print(f"flops (fwd, XLA cost analysis): {flops / 1e9:.2f} GFLOPs "
          f"(batch {batch_size} x {num_points} pts)")
    print(f"throughput: {throughput:.2f} ins/s "
          f"({batch_size * num_points / dt:.0f} pts/s, {dt * 1e3:.1f} ms/step)")
    return {"params_m": n_params / 1e6, "gflops": flops / 1e9,
            "ins_per_sec": throughput}


def profile_grouper(batch_size=4, num_points=24000, radius=0.1, nsample=32,
                    n_runs=200):
    """Grouper micro-benchmark (↔ reference ``examples/profile.py:108-126``):
    self ball-query throughput at the given shape."""
    import jax
    import jax.numpy as jnp

    from amcontrast3d_tpu.ops import ball_query

    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.randn(batch_size, num_points, 3).astype(np.float32)
                      * 10)
    fn = jax.jit(lambda p: ball_query(p, p, radius, nsample))
    out = fn(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = fn(pts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n_runs
    print(f"grouper (ball_query r={radius} k={nsample} "
          f"{batch_size}x{num_points}): {batch_size / dt:.2f} ins/s "
          f"({dt * 1e3:.2f} ms/call)")
    return {"grouper_ins_per_sec": batch_size / dt}


if __name__ == "__main__":
    import argparse

    from amcontrast3d_tpu.utils import EasyConfig

    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--grouper", action="store_true",
                        help="run the ball-query grouper micro-benchmark "
                             "instead of the model profile")
    args, opts = parser.parse_known_args()
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update(opts)
    if args.grouper:
        profile_grouper(batch_size=int(cfg.get("profile_batch_size", 4)),
                        num_points=int(cfg.get("profile_num_points", 24000)),
                        radius=float(cfg.get("radius", 0.1)),
                        nsample=int(cfg.get("nsample", 32)),
                        n_runs=int(cfg.get("profile_n_runs", 200)))
    else:
        profile_model(cfg,
                      batch_size=int(cfg.get("profile_batch_size", 4)),
                      num_points=int(cfg.get("profile_num_points", 24000)),
                      n_runs=int(cfg.get("profile_n_runs", 20)))
