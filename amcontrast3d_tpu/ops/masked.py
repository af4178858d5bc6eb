"""Mask-aware primitives for the true variable-size (packed) model path.

The reference's ``VariableSeg`` (``base_seg.py:190-204``) consumes the packed
offset layout its CUDA pointops use: one flat ``(n_total, …)`` tensor plus a
per-cloud ``offset`` vector, so every cloud keeps its own size through the
stage pyramid.  (In the reference fork it is actually dead code — no encoder
implements the 3-tuple ``forward_seg_feat(data)`` it calls and no config
builds it — but the capability is part of the framework surface.)

TPU-first redesign: packed ragged tensors are hostile to XLA's static-shape
compilation, so the packed layout maps to **dense bucket-padded batches plus
per-cloud valid counts** — mathematically the same clouds, fixed shapes:

* ``pack_to_dense`` / ``dense_to_pack`` convert between the reference offset
  layout and the (B, Nmax, …) + n_valid layout (prefix-valid rows);
* neighbor queries stay per-cloud-correct by pushing invalid support points
  far away (``mask_positions_far``) — they can never enter a ball or a kNN
  set, so valid-point results are bit-identical to an unpadded run;
* FPS restricts to valid points by collapsing the padded tail onto the
  cloud's first point (min-distance 0 ⇒ never the argmax) and keeps the
  reference's per-cloud subsampled size ``max(n_valid // stride, 1)``
  (pointops.furthestsampling's offset arithmetic); FPS is prefix-consistent,
  so the first ``k`` selections equal FPS(k) exactly;
* BatchNorm statistics exclude padded rows via flax's masked BatchNorm.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fps import furthest_point_sample

_FAR = 1e4


def mask_positions_far(p: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Push invalid points out of any plausible neighborhood.  p (B, N, 3),
    valid (B, N) bool.  Valid rows are untouched (bit-exact neighbor sets)."""
    return jnp.where(valid[..., None], p, _FAR)


def collapse_positions(p: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Collapse invalid points onto the cloud's first point (for FPS: their
    min-distance to the selected set is 0 from step one, so they are never
    selected while distinct valid points remain)."""
    return jnp.where(valid[..., None], p, p[:, :1])


def valid_mask(n_valid: jnp.ndarray, n: int) -> jnp.ndarray:
    """(B,) counts → (B, N) prefix-valid bool mask."""
    return jax.lax.broadcasted_iota(jnp.int32, (n_valid.shape[0], n), 1) < \
        n_valid[:, None]


def stride_counts(n_valid: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Per-cloud subsampled size, matching the reference's offset arithmetic
    for variable FPS (count // stride, at least 1)."""
    return jnp.maximum(n_valid // stride, 1)


def fps_masked(p: jnp.ndarray, npoint: int, n_valid: jnp.ndarray
               ) -> jnp.ndarray:
    """FPS over the valid prefix of each cloud → idx (B, npoint) int32.

    FPS is prefix-consistent (selection j does not depend on selections
    > j), so for a cloud whose true subsampled size is k < npoint the first
    k rows are exactly FPS(k); callers mark the tail invalid."""
    B, N, _ = p.shape
    valid = valid_mask(n_valid, N)
    return furthest_point_sample(collapse_positions(p, valid), npoint)


def pack_to_dense(pos: np.ndarray, feats: Optional[np.ndarray],
                  labels: Optional[np.ndarray], offset: np.ndarray,
                  n_max: Optional[int] = None):
    """Reference packed layout → dense padded batch.

    pos (n_total, 3), offset (B,) cumulative ends (``concat_collate_fn``).
    Padded rows repeat each cloud's first point (never selected / never a
    neighbor after masking; keeps all values finite).  Returns a dict with
    'pos' (B, Nmax, 3), optional 'x', optional 'y' (padded with the first
    label), and 'n_valid' (B,) int32."""
    offset = np.asarray(offset, np.int64)
    starts = np.concatenate([[0], offset[:-1]])
    sizes = offset - starts
    b = len(offset)
    if n_max is not None and int(n_max) < int(sizes.max()):
        raise ValueError(
            f"pack_to_dense: n_max={n_max} < largest cloud ({int(sizes.max())}"
            " points) — points would be silently dropped; pick a bucket size"
            " covering every cloud")
    n_max = int(n_max or sizes.max())
    out_pos = np.zeros((b, n_max, pos.shape[-1]), pos.dtype)
    out = {"pos": out_pos, "n_valid": sizes.astype(np.int32)}
    if feats is not None:
        out["x"] = np.zeros((b, n_max, feats.shape[-1]), feats.dtype)
    if labels is not None:
        out["y"] = np.zeros((b, n_max), np.asarray(labels).dtype)
    for i, (s, n) in enumerate(zip(starts, sizes)):
        n = int(min(n, n_max))
        out_pos[i, :n] = pos[s:s + n]
        out_pos[i, n:] = pos[s]
        if feats is not None:
            out["x"][i, :n] = feats[s:s + n]
            out["x"][i, n:] = feats[s]
        if labels is not None:
            out["y"][i, :n] = labels[s:s + n]
            out["y"][i, n:] = labels[s]
    return out


def dense_to_pack(x: np.ndarray, n_valid: np.ndarray
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (B, N, …) + counts → packed (n_total, …) + cumulative offset."""
    parts = [np.asarray(x[i, :int(n)]) for i, n in enumerate(n_valid)]
    return np.concatenate(parts, axis=0), np.cumsum(
        [len(p) for p in parts]).astype(np.int32)
