"""Measured hardware peaks for the roofline table (docs/PERF.md).

Methodology (docs/ROUND4_NOTES.md trap): on the axon remote-tunnel
platform ``block_until_ready`` on a device array does NOT wait for
execution, and eager dispatches cost ~0.8 s each — so every benchmark
chains ALL its work inside ONE jit via ``fori_loop`` and is timed by a
single host scalar fetch; the measured dispatch+roundtrip baseline is
subtracted.

  * vpu_fp32  — Pallas kernel, K dependent FMA sweeps over a VMEM-resident
                (512, 1024) fp32 block → fp32 VPU FLOP/s
  * mxu_*     — fori_loop chain of (4096, 4096) matmuls (bf16 / fp32 at
                default and highest precision) → MXU FLOP/s
  * hbm_gbps  — fori_loop of whole-array scale over 512 MB (read+write
                per iteration) → effective HBM bandwidth

Prints one JSON line.  These anchor every "% of bound" entry in PERF.md.
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

_BASELINE_S = 0.0


def _timed_scalar(fn, *args, trials=3):
    """Compile fn (must return a scalar), then time dispatch→scalar-fetch;
    returns best seconds minus the measured empty-dispatch baseline."""
    import jax
    c = jax.jit(fn).lower(*args).compile()
    _ = float(c(*args))  # warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = float(c(*args))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(out), out
    return max(best - _BASELINE_S, 1e-9)


def _measure_baseline():
    global _BASELINE_S
    import jax
    import jax.numpy as jnp
    x = jnp.float32(1.0)
    c = jax.jit(lambda v: v + 1.0).lower(x).compile()
    _ = float(c(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        _ = float(c(x))
        best = min(best, time.perf_counter() - t0)
    _BASELINE_S = best
    return best


def vpu_peak():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    R, C, K = 512, 1024, 65536  # 2 MB block, K dependent a*x+b sweeps

    def kernel(x_ref, o_ref):
        def body(i, x):
            return x * np.float32(1.0000001) + np.float32(1e-9)
        o_ref[...] = jax.lax.fori_loop(0, K, body, x_ref[...])

    def f(v):
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32))(v)
        return jnp.sum(out)

    dt = _timed_scalar(f, jnp.ones((R, C), jnp.float32))
    return 2.0 * R * C * K / dt


def mxu_peak(dtype, precision):
    import jax
    import jax.numpy as jnp

    n, chain = 4096, 64

    def f(a, b):
        def body(i, x):
            return jax.lax.dot(x, b, precision=precision)
        x = jax.lax.fori_loop(0, chain, body, a)
        return jnp.float32(x[0, 0])

    a = jnp.ones((n, n), dtype)
    b = (jnp.eye(n, dtype=jnp.float32) * 0.999).astype(dtype)
    dt = _timed_scalar(f, a, b)
    return 2.0 * n * n * n * chain / dt


def hbm_bw():
    import jax
    import jax.numpy as jnp

    n, iters = 128 * 1024 * 1024, 16  # 512 MB fp32, 16 read+write passes

    def f(x):
        def body(i, v):
            return v * np.float32(1.0000001)
        return jax.lax.fori_loop(0, iters, body, x)[0]

    dt = _timed_scalar(f, jnp.ones((n,), jnp.float32))
    return iters * 2.0 * n * 4 / dt


def main():
    import jax
    dev = str(jax.devices()[0])
    base = _measure_baseline()
    out = {
        "device": dev,
        "dispatch_roundtrip_ms": round(base * 1e3, 2),
        "vpu_fp32_tflops": round(vpu_peak() / 1e12, 3),
        "mxu_bf16_tflops": round(
            mxu_peak(jax.numpy.bfloat16, jax.lax.Precision.DEFAULT) / 1e12,
            2),
        "mxu_fp32_highest_tflops": round(
            mxu_peak(jax.numpy.float32, jax.lax.Precision.HIGHEST) / 1e12, 2),
        "mxu_fp32_default_tflops": round(
            mxu_peak(jax.numpy.float32, jax.lax.Precision.DEFAULT) / 1e12, 2),
        "hbm_gbps": round(hbm_bw() / 1e9, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
