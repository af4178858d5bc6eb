"""Whole-room eval ladder timings: one flagship AA inference forward per
bucket rung at B=1 (the `mode=test` voting path's per-subcloud shape).

Usage: python tools/ladder_bench.py [N ...]     # default rungs below

Each rung compiles fresh (distinct shapes) and is timed with a scalar
host fetch after the loop (axon block_until_ready under-reports).  The
884k+ rungs exercise the chunk-pruned B==1 FPS (auto ≥262144) and the
query-chunk-streamed separable aggregation tail (_EVAL_GATHER_BUDGET) —
the two round-3 fixes for the HBM/scan blowups at these sizes.
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

DEFAULT_RUNGS = [262144, 442368, 622592, 884736]


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_cfg
    from amcontrast3d_tpu.engine import create_train_state, make_predict_step
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D
    import optax

    rungs = [int(a) for a in sys.argv[1:]] or DEFAULT_RUNGS
    encoder_args, cls_args = _flagship_cfg()
    model = BaseSeg_AMContrast3D(encoder_args=encoder_args, decoder_args={},
                                 cls_args=cls_args)
    predict = make_predict_step(model)
    rng = np.random.RandomState(0)
    for N in rungs:
        pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 12)
        x = jnp.asarray(rng.rand(1, N, 4).astype(np.float32))
        batch = {"pos": pos, "x": x}
        state = create_train_state(model, optax.sgd(0.0),
                                   {"pos": pos[:, :8192], "x": x[:, :8192]},
                                   jax.random.PRNGKey(0))
        psum = jax.jit(lambda s, b: jnp.sum(predict(s, b)))
        t0 = time.perf_counter()
        val = float(psum(state, batch))
        compile_and_first = time.perf_counter() - t0
        it = 3
        t0 = time.perf_counter()
        acc = None
        for _ in range(it):
            acc = psum(state, batch)
        _ = float(acc)
        dt = (time.perf_counter() - t0) / it
        print(f"rung {N:8d}: {dt*1e3:9.1f} ms/forward "
              f"({N/dt/1e3:8.1f}k pts/s; compile+first {compile_and_first:.1f}s, "
              f"logits-sum {val:.3e})", flush=True)


if __name__ == "__main__":
    main()
