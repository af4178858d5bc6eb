"""AMContrast3D-TPU: a TPU-native (JAX/XLA/Pallas) point-cloud semantic
segmentation framework with the capabilities of YangChenApril/AMContrast3D.

The reference stack (PyTorch + CUDA extensions, see /root/reference) is
re-designed TPU-first:

* the CUDA point ops (FPS, kNN, ball query, grouping, 3-NN interpolation)
  become fixed-shape XLA/Pallas ops over dense ``(B, N, ...)`` tensors
  (``amcontrast3d_tpu.ops``);
* PointNeXt encoder/decoder, the AMContrast3D stage bookkeeping, the APM
  ambiguity-prediction branch and masked refinement are Flax modules that
  compile into a single XLA graph together with all loss terms
  (``amcontrast3d_tpu.models``, ``amcontrast3d_tpu.loss``);
* data parallelism runs over a ``jax.sharding.Mesh`` with ``shard_map`` +
  ``psum``/``pmean`` collectives instead of DDP/NCCL
  (``amcontrast3d_tpu.parallel``).
"""

__version__ = "0.1.0"

# The container's sitecustomize force-registers the TPU PJRT plugin in every
# interpreter, which silently overrides an explicit JAX_PLATFORMS=cpu request
# (a CPU-intended CLI run then lands on — and can wedge — the shared TPU).
# Honor the env var explicitly, exactly like __graft_entry__ does.
import os as _os

if _os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the flagship train step is a large graph
# (~minutes to compile); cache compiled executables across processes.
# MEASURED (round 4): the env-var route alone never writes a single entry on
# the axon platform — only the explicit config call does — so set BOTH.
# Keys are stable across processes as long as no file on the trace path
# changes (Pallas kernel payloads embed call-stack source locations).
import os as _os

_os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")
try:
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir",
                       _os.environ["JAX_COMPILATION_CACHE_DIR"])
    _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                       float(_os.environ[
                           "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
except Exception as _e:  # pragma: no cover — jax config surface drift
    # a rename of these config keys would silently reproduce the exact
    # "zero cache entries" failure this call exists to fix — be loud
    import logging as _logging

    _logging.getLogger(__name__).warning(
        "persistent compile cache NOT configured (%s) — flagship compiles "
        "will not be cached", _e)
