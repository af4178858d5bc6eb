"""Native C++ host ops: grid subsampling (barycenter + majority labels) and
KD-tree kNN vs brute-force oracle."""
import numpy as np
import pytest

from amcontrast3d_tpu.native import grid_subsampling, kdtree_knn


def test_grid_subsample_barycenter():
    # two voxels at dl=1.0: [0,1) and [2,3)
    pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.1, 0.1], [2.5, 0.1, 0.1]],
                   np.float32)
    feats = np.array([[1.0], [3.0], [10.0]], np.float32)
    labels = np.array([1, 1, 2], np.int32)
    sp, sf, sl = grid_subsampling(pts, feats, labels, sampleDl=1.0)
    assert len(sp) == 2
    order = np.argsort(sp[:, 0])
    np.testing.assert_allclose(sp[order][0], [0.2, 0.1, 0.1], atol=1e-6)
    np.testing.assert_allclose(sf[order][0], [2.0], atol=1e-6)
    assert sl[order][0] == 1 and sl[order][1] == 2


def test_grid_subsample_majority_label():
    pts = np.zeros((5, 3), np.float32)
    labels = np.array([3, 3, 3, 7, 7], np.int32)
    sp, sl = grid_subsampling(pts, None, labels, sampleDl=1.0)
    assert len(sp) == 1 and sl[0] == 3


def test_grid_subsample_points_only(rng):
    pts = rng.rand(5000, 3).astype(np.float32) * 4
    sp = grid_subsampling(pts, sampleDl=0.5)
    # one output per occupied voxel
    vox = np.floor(pts / 0.5)
    occupied = len(set(map(tuple, vox.astype(np.int64))))
    assert len(sp) == occupied


def test_kdtree_knn_matches_bruteforce(rng):
    sup = rng.rand(500, 3).astype(np.float32)
    q = rng.rand(50, 3).astype(np.float32)
    idx, d2 = kdtree_knn(sup, q, 5)
    d = ((q[:, None] - sup[None]) ** 2).sum(-1)
    oidx = np.argsort(d, axis=-1, kind="stable")[:, :5]
    od = np.take_along_axis(d, oidx, -1)
    np.testing.assert_allclose(d2, od, rtol=1e-4, atol=1e-5)
    # indices may differ on exact ties; distances must match
    got_d = np.take_along_axis(d, idx, -1)
    np.testing.assert_allclose(got_d, od, rtol=1e-4, atol=1e-5)


def test_kdtree_knn_k_exceeds_n(rng):
    sup = rng.rand(3, 3).astype(np.float32)
    q = rng.rand(2, 3).astype(np.float32)
    idx, d2 = kdtree_knn(sup, q, 5)
    assert idx.shape == (2, 5)
    assert np.all(d2[:, 3:] >= 1e9)
