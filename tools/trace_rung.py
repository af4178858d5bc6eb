"""Trace one whole-room eval-ladder rung forward and summarize HLO
self-times (what dominates the B==1 large-N eval path).

Usage: python tools/trace_rung.py [N] [outdir]
Parse with: python tools/parse_xplane.py <outdir>
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


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_cfg
    from amcontrast3d_tpu.engine import create_train_state, make_predict_step
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 442368
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/trace_rung_{N}"

    encoder_args, cls_args = _flagship_cfg()
    model = BaseSeg_AMContrast3D(encoder_args=encoder_args, decoder_args={},
                                 cls_args=cls_args)
    predict = make_predict_step(model)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 12)
    x = jnp.asarray(rng.rand(1, N, 4).astype(np.float32))
    batch = {"pos": pos, "x": x}
    state = create_train_state(model, optax.sgd(0.0),
                               {"pos": pos[:, :8192], "x": x[:, :8192]},
                               jax.random.PRNGKey(0))
    psum = jax.jit(lambda s, b: jnp.sum(predict(s, b)))
    compiled = psum.lower(state, batch).compile()
    _ = float(compiled(state, batch))           # warm
    t0 = time.perf_counter()
    _ = float(compiled(state, batch))
    print(f"rung {N}: {time.perf_counter() - t0:.2f}s/forward (warm)",
          flush=True)
    with jax.profiler.trace(outdir):
        _ = float(compiled(state, batch))
    print("trace written to", outdir, flush=True)


if __name__ == "__main__":
    main()
