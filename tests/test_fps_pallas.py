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
