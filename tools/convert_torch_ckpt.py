"""Convert a torch reference checkpoint (.pth) to this repo's .ckpt format.

Usage:
    python tools/convert_torch_ckpt.py model_best.pth [out.ckpt]

The output is the repo's native checkpoint file (flax msgpack state inside a
pickle envelope, utils/ckpt.py) holding {params, batch_stats} plus whatever
sidecar scalars the .pth carried (epoch, best_val, ...).  It can be passed to
``--pretrained_path`` for eval/finetune; note ``--pretrained_path model.pth``
also works directly (the loader converts on the fly) — this tool exists for
one-off conversion + inspection.

Mirrors the reference release workflow: README.md:76-84 loads published .pth
checkpoints via openpoints/utils/ckpt_util.py:137-183 (envelope unwrap,
module.-prefix strip, strict=False).
"""
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    src = sys.argv[1]
    dst = sys.argv[2] if len(sys.argv) > 2 else (
        os.path.splitext(src)[0] + ".ckpt")

    from flax import serialization

    from amcontrast3d_tpu.utils.torch_convert import convert_torch_checkpoint

    state, extras = convert_torch_checkpoint(src)

    def _count(tree):
        import numpy as np
        return sum(int(np.prod(np.shape(v))) for v in _leaves(tree))

    def _leaves(tree):
        for v in tree.values():
            if isinstance(v, dict):
                yield from _leaves(v)
            else:
                yield v

    payload = {"epoch": int(extras.get("epoch", 0) or 0),
               **{k: v for k, v in extras.items()
                  if isinstance(v, (int, float, str, bool))},
               "state": serialization.to_bytes(state)}
    with open(dst, "wb") as f:
        pickle.dump(payload, f)
    print(f"converted {src} -> {dst}")
    print(f"  params: {_count(state['params']) / 1e6:.4f} M, "
          f"batch_stats: {_count(state['batch_stats']) / 1e6:.4f} M, "
          f"extras: { {k: v for k, v in payload.items() if k != 'state'} }")


if __name__ == "__main__":
    main()
