"""AOT-compile a whole-room ladder rung and print XLA's memory analysis
WITHOUT executing it — a pre-flight check before running rungs that
previously exhausted HBM (the 884k outage class).

Usage: python tools/rung_mem_probe.py [N] [--run]

With --run, executes one forward after a clean compile and prints the
logits sum + wall time.
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

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(args[0]) if args else 884736
    run = "--run" in sys.argv

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
    t0 = time.perf_counter()
    compiled = psum.lower(state, batch).compile()
    print(f"rung {N}: compiled in {time.perf_counter() - t0:.1f}s", flush=True)
    try:
        mem = compiled.memory_analysis()
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                print(f"  {k}: {v / 1e9:.3f} GB", flush=True)
    except Exception as e:
        print(f"  memory_analysis unavailable: {e}", flush=True)
    if run:
        t0 = time.perf_counter()
        val = float(compiled(state, batch))
        dt = time.perf_counter() - t0
        print(f"  forward: {dt:.2f}s ({N / dt / 1e3:.1f}k pts/s), "
              f"logits-sum {val:.3e}", flush=True)


if __name__ == "__main__":
    main()
