"""Micro-benchmark: dense vs chunk-pruned B==1 FPS at eval-ladder sizes.

Usage: python tools/fps_micro_bench.py [N ...]   (default 262144 442368)
Prints per-variant wall-clock for npoint = N // 4 (the stage-1 stride).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def train_mode():
    """A/B the batched training path: dense batched kernel vs the
    chunk-pruned per-cloud core (B=4 x 24000 -> 6000, the flagship
    stage-1 shape).  Timing follows the repo rule: chain iterations and
    force ONE scalar fetch at the end."""
    import amcontrast3d_tpu.ops.fps_pallas as FP

    rng = np.random.RandomState(0)
    B, N = 4, 24000
    npoint = N // 4
    xyz = jnp.asarray(rng.rand(B, N, 3).astype(np.float32)
                      * np.array([8.0, 8.0, 3.0], np.float32))

    def chain(fn, reps=8):
        out = fn(xyz)
        jax.block_until_ready(out)
        t0 = time.time()
        p = xyz
        for _ in range(reps):
            idx = fn(p)
            # chain: shift positions by a value derived from the output
            p = p + 1e-12 * idx[:, :1, None].astype(jnp.float32)
        float(jnp.sum(idx[:, -1].astype(jnp.float32)))  # one host fetch
        return (time.time() - t0) / reps * 1000.0, idx

    # force the dense path for the dense arm — if AMC3D_FPS_PRUNED_TRAIN=on
    # is set in the environment the public dispatcher would route BOTH arms
    # through the pruned core and the A/B would be meaningless
    FP.set_fps_pruned_train("off")
    dense_fn = jax.jit(lambda p: FP.furthest_point_sample_pallas(p, npoint))
    pruned_fn = jax.jit(lambda p: FP._fps_pruned_batched(p, npoint, False))
    ms_d, idx_d = chain(dense_fn)
    ms_p, idx_p = chain(pruned_fn)
    same = bool((np.asarray(idx_d) == np.asarray(idx_p)).all())
    print(f"B={B} N={N} npoint={npoint} dense {ms_d:8.2f} ms  "
          f"pruned {ms_p:8.2f} ms  equal={same}", flush=True)


def main():
    if "--train" in sys.argv:
        return train_mode()
    sizes = [int(x) for x in sys.argv[1:]] or [262144, 442368]
    import amcontrast3d_tpu.ops.fps_pallas as FP

    rng = np.random.RandomState(0)
    for N in sizes:
        npoint = N // 4
        xyz = jnp.asarray(rng.rand(1, N, 3).astype(np.float32)
                          * np.array([8.0, 8.0, 3.0], np.float32))
        planes = xyz.transpose(2, 0, 1)
        for name, fn in (("dense", FP._fps_b1), ("pruned", FP._fps_b1_pruned)):
            t0 = time.time()
            out = jax.block_until_ready(
                fn(planes[0], planes[1], planes[2], N, npoint, False))
            compile_s = time.time() - t0
            t0 = time.time()
            out = jax.block_until_ready(
                fn(planes[0], planes[1], planes[2], N, npoint, False))
            int(np.asarray(out)[0, -1])          # host fetch
            dt = time.time() - t0
            print(f"N={N:7d} npoint={npoint:6d} {name:7s} "
                  f"{dt*1000:9.1f} ms (first call {compile_s:.1f} s)",
                  flush=True)


if __name__ == "__main__":
    main()
