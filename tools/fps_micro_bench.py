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


def main():
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
