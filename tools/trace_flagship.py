"""Trace the flagship AA train step and summarize HLO self-times.

Usage: python tools/trace_flagship.py [outdir=/tmp/trace_flagship]

Compiles the same step bench.py times, runs a few warm iterations, then
records a jax.profiler trace of 3 steps.  Parse with tools/parse_xplane.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_flagship"
    import jax

    from __graft_entry__ import AMBIGUITY_ARGS, _batch, _flagship_cfg
    from amcontrast3d_tpu.engine import (build_tx, create_train_state,
                                         make_train_step)
    from amcontrast3d_tpu.loss import CrossEntropyAce
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D
    from amcontrast3d_tpu.scheduler import (as_step_schedule,
                                            build_scheduler_from_cfg)
    import jax.numpy as jnp

    amp = os.environ.get("BENCH_AMP", "0") != "0"
    dtype = jnp.bfloat16 if amp else jnp.float32
    encoder_args, cls_args = _flagship_cfg()
    # BENCH_KIND=mm → the AMContrast3D++ flagship (same shapes bench.py times)
    kind = os.environ.get("BENCH_KIND", "aa")
    ambiguity_args = dict(AMBIGUITY_ARGS)
    if kind == "mm":
        from amcontrast3d_tpu.loss import CrossEntropyAcePre
        from amcontrast3d_tpu.models import BaseSeg_M_AMContrast3D
        apm_args = {"NAME": "APM_pf_ConCate",
                    "feature_dim": [64, 128, 256, 512],
                    "linear_mapping": False, "cross_attention": False,
                    "feat_concate": False,
                    "channel": [32, 16, 8, 4, 2], "dropout": [0, 0, 0, 0, 0],
                    "nsample_k": 12, "threshold": 0.9, "threshold_max": 1.0,
                    "gamma": 1, "fusion": "MIN", "att_dim": 3}
        ambiguity_args.update(source="APM", source_mode="Train")
        model = BaseSeg_M_AMContrast3D(
            encoder_args=encoder_args, decoder_args={}, cls_args=cls_args,
            AEF_args=ambiguity_args, APM_args=apm_args, dtype=dtype)
        criterion = CrossEntropyAcePre()
    else:
        model = BaseSeg_AMContrast3D(encoder_args=encoder_args,
                                     decoder_args={}, cls_args=cls_args,
                                     dtype=dtype)
        criterion = CrossEntropyAce()
    lr_fn, _ = build_scheduler_from_cfg({"sched": "cosine", "epochs": 150,
                                         "lr": 0.01, "min_lr": 1e-5})
    tx = build_tx({"NAME": "adamw", "weight_decay": 1e-4},
                  as_step_schedule(lr_fn, 100), grad_norm_clip=10.0)
    B = int(os.environ.get("BENCH_BATCH", 4))
    N = int(os.environ.get("BENCH_POINTS", 24000))
    batch = _batch(B, N)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    step_fn = make_train_step(model, criterion, tx, kind, 13, None,
                              ambiguity_args)
    jit_step = jax.jit(step_fn, donate_argnums=(0,))
    rngk = jax.random.PRNGKey(1)
    step = jit_step.lower(state, batch, rngk).compile()
    for _ in range(3):
        state, metrics = step(state, batch, rngk)
        _ = float(metrics["loss"])
    with jax.profiler.trace(outdir):
        for _ in range(3):
            state, metrics = step(state, batch, rngk)
            _ = float(metrics["loss"])
    print("trace written to", outdir)


if __name__ == "__main__":
    main()
