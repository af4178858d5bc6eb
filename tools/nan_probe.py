"""Locate non-finite intermediates in the flagship eval forward at a given
rung size (debug tool for the whole-room ladder).

Usage: python tools/nan_probe.py [N] [seed]

Captures SetAbstraction / FeaturePropagation / InvResMLP / SegHead outputs
via flax capture_intermediates (bounded memory: stage boundaries only) and
prints a finite/NaN/Inf summary per module path.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))

import numpy as np

CAPTURE = ("SetAbstraction", "FeaturePropagation", "InvResMLP", "SegHead")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_cfg
    from amcontrast3d_tpu.engine import create_train_state
    from amcontrast3d_tpu.models import BaseSeg_AMContrast3D

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 442368
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    encoder_args, cls_args = _flagship_cfg()
    model = BaseSeg_AMContrast3D(encoder_args=encoder_args, decoder_args={},
                                 cls_args=cls_args)
    rng = np.random.RandomState(seed)
    pos = jnp.asarray(rng.rand(1, N, 3).astype(np.float32) * 12)
    x = jnp.asarray(rng.rand(1, N, 4).astype(np.float32))
    state = create_train_state(model, optax.sgd(0.0),
                               {"pos": pos[:, :8192], "x": x[:, :8192]},
                               jax.random.PRNGKey(0))

    def fwd(pos, x):
        out, inter = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            pos, x, training=False,
            capture_intermediates=lambda mdl, _:
                type(mdl).__name__ in CAPTURE)
        logits = out[0] if isinstance(out, tuple) else out

        def stats(leaf):
            if not isinstance(leaf, jnp.ndarray) or leaf.dtype.kind != "f":
                return None
            return (jnp.isnan(leaf).sum().astype(jnp.int32),
                    jnp.isinf(leaf).sum().astype(jnp.int32))

        flat = jax.tree_util.tree_flatten_with_path(
            inter["intermediates"], is_leaf=lambda l: isinstance(l, jnp.ndarray))[0]
        keys = [jax.tree_util.keystr(k) for k, v in flat
                if stats(v) is not None]
        vals = [stats(v) for _, v in flat if stats(v) is not None]
        return logits, keys, vals

    keys = None

    def fwd_dev(pos, x):
        logits, ks, vals = fwd(pos, x)
        nonlocal_keys.append(ks)
        return (jnp.isnan(logits).sum().astype(jnp.int32),
                jnp.isinf(logits).sum().astype(jnp.int32), vals)

    nonlocal_keys = []
    jf = jax.jit(fwd_dev)
    lnan, linf, vals = jf(pos, x)
    keys = nonlocal_keys[0]
    print(f"N={N} seed={seed} logits: nan={int(lnan)} inf={int(linf)}",
          flush=True)
    for k, (nn_, ni) in zip(keys, vals):
        nn_, ni = int(nn_), int(ni)
        flag = "  <-- BAD" if (nn_ or ni) else ""
        print(f"  {k}: nan={nn_} inf={ni}{flag}")


if __name__ == "__main__":
    main()
