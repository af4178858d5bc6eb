"""Pallas FPS kernel vs the lax implementation / numpy oracle (interpret
mode on CPU; the compiled path runs on real TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from amcontrast3d_tpu.ops.fps import furthest_point_sample
from amcontrast3d_tpu.ops.fps_pallas import furthest_point_sample_pallas


def test_pallas_fps_matches_lax(rng):
    xyz = jnp.asarray(rng.rand(2, 256, 3).astype(np.float32))
    a = np.asarray(furthest_point_sample(xyz, 64))
    b = np.asarray(furthest_point_sample_pallas(xyz, 64, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_single_batch(rng):
    xyz = jnp.asarray(rng.rand(1, 128, 3).astype(np.float32) * 3)
    a = np.asarray(furthest_point_sample(xyz, 32))
    b = np.asarray(furthest_point_sample_pallas(xyz, 32, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_chunked_output_path(rng, monkeypatch):
    """B==1 large-npoint runs chunk output rows over a sequential grid (the
    whole-room rungs OOM'd VMEM on the single-block output); forcing a
    tiny chunk size must not change the sampled indices."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_TO", 8)
    xyz = jnp.asarray(rng.rand(1, 256, 3).astype(np.float32) * 2)
    a = np.asarray(furthest_point_sample(xyz, 50))  # 50 > 4*8 and 50 % 8 != 0
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 50, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_b1_reshaped_padded(rng, monkeypatch):
    """B==1 runs the (8, N/8)-reshaped layout (exact VMEM footprint for
    whole-room rungs); ragged N exercises the pad tail, tiny _TO the
    output chunking on top."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_TO", 8)
    xyz = jnp.asarray(rng.rand(1, 203, 3).astype(np.float32) * 2)
    a = np.asarray(furthest_point_sample(xyz, 60))
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 60, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_b1_multicall(rng, monkeypatch):
    """The B==1 sampler splits across bounded calls (device watchdog kills
    multi-second kernels); forcing tiny per-call budgets must not change
    the sampled indices."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_B1_OPS_BUDGET", 1.0)  # outer -> _TO floor
    monkeypatch.setattr(FP, "_TO", 16)
    xyz = jnp.asarray(rng.rand(1, 300, 3).astype(np.float32) * 2)
    a = np.asarray(furthest_point_sample(xyz, 100))
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 100, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_b1_multirow_layout(rng, monkeypatch):
    """Past the lane-width cap the planes reshape to (R>8, N/R); the
    global row-major index must keep sampling identical."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_B1_MAX_LANES", 16)  # force rows > 8
    xyz = jnp.asarray(rng.rand(1, 300, 3).astype(np.float32) * 2)
    a = np.asarray(furthest_point_sample(xyz, 64))
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 64, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_b1_pruned_matches_lax(rng, monkeypatch):
    """Chunk-pruned B==1 sampler: kd-chunk skipping is provably exact (the
    conservative absolute slack forbids wrong skips), so indices must be
    bit-identical to the lax path."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_PRUNE_CS", 512)
    monkeypatch.setattr(FP, "_PRUNED", "on")
    xyz = jnp.asarray(rng.rand(1, 3000, 3).astype(np.float32) * 5)
    a = np.asarray(furthest_point_sample(xyz, 600))
    planes = xyz.transpose(2, 0, 1)
    b = np.asarray(FP._fps_b1_pruned(planes[0], planes[1], planes[2],
                                     3000, 600, True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_pruned_batched_matches_lax(rng, monkeypatch):
    """Chunk-pruned B>1 training path: one batched kd-sort + the proven
    pruned core per cloud must stay bit-identical to the lax oracle
    (ragged N exercises the pad rows; CS forced small for multi-chunk)."""
    import amcontrast3d_tpu.ops.contrast_pallas as CP
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(CP, "CS", 512)
    monkeypatch.setattr(FP, "_PRUNED_TRAIN", "on")
    xyz = jnp.asarray(rng.rand(3, 2990, 3).astype(np.float32) * 5)
    a = np.asarray(furthest_point_sample(xyz, 400))
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 400, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_pruned_batched_single_chunk(rng, monkeypatch):
    """Degenerate single-chunk shape (N <= CS) through the batched pruned
    dispatch: pruning has nothing to skip but must stay exact."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_PRUNED_TRAIN", "on")
    xyz = jnp.asarray(rng.rand(2, 700, 3).astype(np.float32) * 2)
    a = np.asarray(furthest_point_sample(xyz, 175))
    b = np.asarray(FP.furthest_point_sample_pallas(xyz, 175, interpret=True))
    np.testing.assert_array_equal(a, b)


def test_pallas_fps_b1_pruned_ragged_multicall(rng, monkeypatch):
    """Ragged N (pad rows never selected) + multi-call splitting with the
    aliased (mind, last) state and per-call stats rebuild."""
    import amcontrast3d_tpu.ops.fps_pallas as FP
    monkeypatch.setattr(FP, "_PRUNE_CS", 512)
    monkeypatch.setattr(FP, "_B1_OPS_BUDGET", 1.0)
    monkeypatch.setattr(FP, "_TO", 64)
    xyz = jnp.asarray(rng.rand(1, 2791, 3).astype(np.float32) * 5)
    a = np.asarray(furthest_point_sample(xyz, 300))
    planes = xyz.transpose(2, 0, 1)
    b = np.asarray(FP._fps_b1_pruned(planes[0], planes[1], planes[2],
                                     2791, 300, True))
    np.testing.assert_array_equal(a, b)
