"""Measured hardware peaks for the roofline table (docs/PERF.md).

Three one-kernel microbenchmarks, each timed INSIDE one jit (the axon
remote-tunnel platform charges ~0.8 s per eager dispatch — see
docs/ROUND4_NOTES.md methodology trap):

  * vpu_fp32   — Pallas kernel, K dependent FMA sweeps over a VMEM-resident
                 (256, 1024) fp32 block → fp32 VPU FLOP/s peak
  * mxu        — chained (4096, 4096) matmuls (bf16 and fp32-highest) →
                 MXU FLOP/s at both precisions actually used by the step
  * hbm        — big-array copy (x = x * 1.0 over 512 MB) → effective HBM
                 read+write bandwidth

Prints one JSON line with the measured peaks.  These anchor every "% of
bound" entry in PERF.md — no datasheet numbers.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np


def _time_compiled(fn, *args, iters=5):
    import jax
    c = jax.jit(fn).lower(*args).compile()
    out = jax.block_until_ready(c(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jax.block_until_ready(c(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def vpu_peak():
    import jax
    from jax.experimental import pallas as pl

    R, C, K = 256, 1024, 4096  # 1 MB block, K dependent a*x+b sweeps

    def kernel(x_ref, o_ref):
        def body(i, x):
            return x * np.float32(1.0000001) + np.float32(1e-7)
        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])

    x = jax.numpy.ones((R, C), jax.numpy.float32)
    f = lambda v: pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((R, C), jax.numpy.float32))(v)
    dt, _ = _time_compiled(f, x)
    flops = 2.0 * R * C * K
    return flops / dt


def mxu_peak(dtype, precision):
    import jax
    import jax.numpy as jnp

    n, chain = 4096, 8

    def f(a, b):
        x = a
        for _ in range(chain):
            x = jnp.dot(x, b, precision=precision)
        return x

    a = jnp.ones((n, n), dtype)
    b = jnp.eye(n, dtype=dtype) * dtype(0.999)
    dt, _ = _time_compiled(f, a, b)
    flops = 2.0 * n * n * n * chain
    return flops / dt


def hbm_bw():
    import jax
    import jax.numpy as jnp

    n = 128 * 1024 * 1024  # 512 MB fp32

    def f(x):
        return x * np.float32(1.0000001)

    x = jnp.ones((n,), jnp.float32)
    dt, _ = _time_compiled(f, x)
    return 2.0 * n * 4 / dt  # read + write


def main():
    import jax
    dev = str(jax.devices()[0])
    out = {
        "device": dev,
        "vpu_fp32_tflops": round(vpu_peak() / 1e12, 3),
        "mxu_bf16_tflops": round(
            mxu_peak(jax.numpy.bfloat16,
                     jax.lax.Precision.DEFAULT) / 1e12, 2),
        "mxu_fp32_highest_tflops": round(
            mxu_peak(jax.numpy.float32, jax.lax.Precision.HIGHEST) / 1e12, 2),
        "mxu_fp32_default_tflops": round(
            mxu_peak(jax.numpy.float32, jax.lax.Precision.DEFAULT) / 1e12, 2),
        "hbm_gbps": round(hbm_bw() / 1e9, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
