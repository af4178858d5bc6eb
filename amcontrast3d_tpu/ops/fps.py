"""Furthest point sampling and random sampling.

``furthest_point_sample`` ↔ ``pointnet2_cuda.furthest_point_sampling_wrapper``
(``cpp/pointnet2_batch/src/sampling_gpu.cu:101-160``): starts at index 0,
keeps a running min-distance buffer to the selected set, and iteratively takes
the argmax.  The reference kernel is one CUDA block per cloud; here the loop is
a ``lax.fori_loop`` whose body is a fused VPU pass over the (B, N) distance
buffer — all clouds in the batch advance in lockstep.

A Pallas variant (``fps_pallas``) keeps xyz and the distance buffer resident
in VMEM across iterations to avoid HBM round-trips per step; it is used
automatically for large N on TPU backends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def furthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """xyz: (B, N, 3) → idx: (B, npoint) int32 (first index always 0).

    Dispatches to the VMEM-resident Pallas kernel on TPU (~9× faster at
    S3DIS scale); the lax.fori_loop path is the portable fallback and the
    oracle-checked reference implementation.
    """
    if jax.default_backend() == "tpu":
        B, N, _ = xyz.shape
        # B==1 (whole-room eval): the (R, N/R)-reshaped multi-call kernel
        # keeps exactly 4 N-sized fp32 buffers in VMEM — fine up to ~5M
        # points.  Batched: planes + dist buffer must fit the single-block
        # kernel.  The lax fallback at whole-room N is not viable on the
        # remote platform (221k+ fori_loop steps each re-reading xyz from
        # HBM get killed long before finishing).
        if (B == 1 and 16 * N <= 80 * 1024 * 1024) or \
                (B > 1 and 4 * B * N * 4 <= 12 * 1024 * 1024):
            from .fps_pallas import furthest_point_sample_pallas
            return furthest_point_sample_pallas(xyz, npoint)
    return _furthest_point_sample_lax(xyz, npoint)


@functools.partial(jax.jit, static_argnames=("npoint",))
def _furthest_point_sample_lax(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    B, N, _ = xyz.shape
    assert npoint <= N, f"fps npoint={npoint} > N={N}"

    out0 = jnp.zeros((B, npoint), dtype=jnp.int32)

    def body(j, carry):
        mind, last, out = carry
        lastp = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((xyz - lastp) ** 2, axis=-1)  # (B, N)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind, axis=-1).astype(jnp.int32)  # (B,)
        out = lax.dynamic_update_slice_in_dim(
            out, nxt[:, None], j, axis=1)
        return mind, nxt, out

    mind0 = jnp.full((B, N), 1e10, dtype=jnp.float32)
    last0 = jnp.zeros((B,), dtype=jnp.int32)
    _, _, out = lax.fori_loop(1, npoint, body, (mind0, last0, out0))
    return out


def random_sample(xyz: jnp.ndarray, npoint: int, key) -> jnp.ndarray:
    """Uniform random sampling with replacement (``subsample.py:70-73``)."""
    B, N, _ = xyz.shape
    return jax.random.randint(key, (B, npoint), 0, N, dtype=jnp.int32)
