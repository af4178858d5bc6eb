"""Micro-benchmark: fused slot-reduce aggregation vs the gather tail.

Times forward+backward of the SA1-shaped aggregation (the encoder's
hottest grouped reduction: support 24000 -> 6000 queries, C=128, K=32,
S3DIS flagship) on the attached accelerator.  Fast signal (~2-3 min
compile) before committing to a full bench run.

Usage: python tools/agg_micro_bench.py [B N M C K radius]
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
    defaults = [4, 24000, 6000, 128, 32]
    given = [int(x) for x in sys.argv[1:6]]
    B, N, M, C, K = given + defaults[len(given):]
    radius = float(sys.argv[6]) if len(sys.argv) > 6 else 0.1

    from amcontrast3d_tpu.ops import ball_query
    from amcontrast3d_tpu.ops.aggregate_pallas import grouped_slot_reduce

    rng = np.random.RandomState(0)
    # room-like extent so kd-chunk pruning sees realistic geometry
    sup_p = jnp.asarray(rng.rand(B, N, 3).astype(np.float32)
                        * np.array([8.0, 8.0, 3.0], np.float32))
    q_p = sup_p[:, :M]
    u = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    qp = jnp.asarray(rng.randn(B, M, C).astype(np.float32) * 0.1)
    sgn = jnp.ones((C,), jnp.float32)
    idx = jax.block_until_ready(ball_query(sup_p, q_p, radius, K))
    ct = jnp.asarray(rng.randn(B, M, C).astype(np.float32))

    def fused(u_, qp_):
        ext, su, sq = grouped_slot_reduce(sup_p, q_p, u_, idx, sgn,
                                          radius=radius, qp=qp_)
        return jnp.sum(ext * ct) + jnp.sum(su) + 0.1 * jnp.sum(sq)

    def gather(u_, qp_):
        slot = jnp.take_along_axis(
            u_, idx.reshape(B, M * K)[..., None].astype(jnp.int32), axis=1
        ).reshape(B, M, K, C)
        h = slot - qp_[:, :, None, :]
        ext = jnp.max(slot, axis=2)
        return (jnp.sum(ext * ct) + jnp.sum(jnp.sum(h, axis=2))
                + 0.1 * jnp.sum(jnp.sum(h * h, axis=2)))

    for name, fn in (("gather", gather), ("fused", fused)):
        vg = jax.jit(jax.value_and_grad(fn, argnums=(0, 1)))
        t0 = time.time()
        l, _ = vg(u, qp)
        float(l)
        compile_s = time.time() - t0
        iters = 20
        t0 = time.time()
        for _ in range(iters):
            l, (gu, gqp) = vg(u, qp)
            float(l)                      # force host fetch (axon timing)
        dt = (time.time() - t0) / iters * 1000
        print(f"{name:7s} fwd+bwd {dt:8.2f} ms  (compile {compile_s:.1f} s, "
              f"loss {float(l):.3e})", flush=True)


if __name__ == "__main__":
    main()
