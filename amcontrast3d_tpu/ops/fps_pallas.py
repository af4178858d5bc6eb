"""Pallas TPU kernel for furthest point sampling.

The XLA ``fori_loop`` FPS (ops/fps.py) round-trips the (B, N) min-distance
buffer through HBM every iteration and pays loop dispatch overhead ~npoint
times.  This kernel keeps coordinates and the distance buffer resident in
VMEM for the whole sampling loop and advances ALL clouds in the batch per
iteration on the VPU:

  * layout: x/y/z as (B, N) planes (lane dim = points), mind (B, N) scratch;
  * the previously selected point is materialized per row with a one-hot
    mask-reduce (no dynamic lane indexing);
  * argmax with lowest-index tie-breaking via ``where(mind==max, iota, N)``
    + min-reduce, matching the CUDA kernel's scan-order tie behavior
    (``sampling_gpu.cu:101-160``) and the numpy oracle;
  * indices are written row-wise into a (npoint, B) output (dynamic stores
    on the sublane dim are cheap).

Semantics identical to ``ops.fps.furthest_point_sample``: first index 0,
exact max-min sampling.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e10


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, npoint: int):
    B, N = x_ref.shape
    col = lax.broadcasted_iota(jnp.int32, (B, N), 1)

    mind_ref[:] = jnp.full((B, N), _INF, dtype=jnp.float32)
    out_ref[0, :] = jnp.zeros((B,), dtype=jnp.int32)

    x, y, z = x_ref[:], y_ref[:], z_ref[:]

    def body(j, last):
        onehot = (col == last).astype(jnp.float32)  # (B, N)
        px = jnp.sum(x * onehot, axis=1, keepdims=True)
        py = jnp.sum(y * onehot, axis=1, keepdims=True)
        pz = jnp.sum(z * onehot, axis=1, keepdims=True)
        d = (x - px) ** 2 + (y - py) ** 2 + (z - pz) ** 2
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        m = jnp.max(mind, axis=1, keepdims=True)
        cand = jnp.where(mind == m, col, N)
        nxt = jnp.min(cand, axis=1, keepdims=True).astype(jnp.int32)  # (B,1)
        out_ref[pl.ds(j, 1), :] = nxt.reshape(1, B)
        return nxt

    lax.fori_loop(1, npoint, body, jnp.zeros((B, 1), dtype=jnp.int32))


@functools.partial(jax.jit, static_argnames=("npoint", "interpret"))
def furthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """xyz: (B, N, 3) → idx (B, npoint) int32 (VMEM-resident Pallas FPS)."""
    B, N, _ = xyz.shape
    planes = xyz.transpose(2, 0, 1)  # (3, B, N)
    x, y, z = planes[0], planes[1], planes[2]
    kernel = functools.partial(_fps_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npoint, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, N), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out.T
