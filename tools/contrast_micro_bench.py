"""Micro-benchmark: fused contrast stage loss fwd+bwd at flagship stage
shapes, for TQ/CS tile sweeps.

The contrast kernel family reads its tile sizes from AMC3D_CONTRAST_TQ /
AMC3D_CONTRAST_CS at import, so run one process per variant:

    AMC3D_CONTRAST_TQ=1024 python tools/contrast_micro_bench.py

Times per stage (B=4; N,C from the AA flagship: 24000x64, 6000x128,
1500x256, 375x512) with a scalar host fetch per timed loop (axon
block_until_ready under-reports).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


ARGS = {"nsample": 24, "temperature": 0.1, "cctype": "Method2",
        "ccbeta": 1.0, "margin": "adaptive", "mu": 0.4, "nu": 0.5,
        "db": "-m", "supervisedCL": "Method1", "fused": True}


def main():
    import jax
    import jax.numpy as jnp

    from amcontrast3d_tpu.loss.contrast import point_contrast_margin_fused
    from amcontrast3d_tpu.ops import contrast_pallas as cp

    print(f"TQ={cp.TQ} CS={cp.CS}")
    rng = np.random.RandomState(0)
    stages = [(4, 24000, 64), (4, 6000, 128), (4, 1500, 256), (4, 375, 512)]
    total = 0.0
    for B, N, C in stages:
        p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) * 10)
        f = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        y = jnp.asarray(rng.randint(0, 13, (B, N)).astype(np.int32))

        def loss(f, p, y):
            l, _ = point_contrast_margin_fused(p, f, y, ARGS)
            return l

        vg = jax.jit(jax.value_and_grad(loss))
        l, g = vg(f, p, y)
        _ = float(l)
        it = 10
        t0 = time.perf_counter()
        for _ in range(it):
            l, g = vg(f, p, y)
        _ = float(l) + float(jnp.sum(g) * 0.0)
        dt = (time.perf_counter() - t0) / it * 1e3
        total += dt
        print(f"stage B={B} N={N:6d} C={C:4d}: {dt:8.2f} ms fwd+bwd",
              flush=True)
    print(f"total: {total:.2f} ms")


if __name__ == "__main__":
    main()
