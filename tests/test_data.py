"""Data-layer tests: voxelize/crop oracles, transforms, loader, datasets."""
import numpy as np
import pytest

from amcontrast3d_tpu.data import (NumpyLoader, Synthetic, build_dataloader_from_cfg,
                                   crop_pc, get_features_by_keys, voxelize)
from amcontrast3d_tpu.transforms import build_transforms_from_cfg


def test_voxelize_unique_voxels(rng):
    coord = rng.rand(5000, 3).astype(np.float32) * 2
    idx = voxelize(coord, 0.1)
    # one point per occupied voxel
    vox = np.floor(coord[idx] / 0.1).astype(np.int64)
    keys = set(map(tuple, vox))
    assert len(keys) == len(idx)
    # mode 1 returns a sorted partition of all points
    idx_sort, voxel_idx, count = voxelize(coord, 0.1, mode=1)
    assert len(idx_sort) == len(coord)
    assert count.sum() == len(coord)
    assert voxel_idx.max() + 1 == len(count)


def test_crop_pc_fixed_size(rng):
    coord = rng.rand(3000, 3).astype(np.float32) * 5
    feat = rng.rand(3000, 3).astype(np.float32)
    label = rng.randint(0, 13, (3000, 1)).astype(np.int64)
    c, f, l = crop_pc(coord, feat, label, 'train', 0.04, 1024,
                      variable=False)
    assert c.shape == (1024, 3) and f.shape == (1024, 3) and l.shape == (1024, 1)
    assert c.min(0).min() >= 0  # shifted to origin


def test_crop_pc_pads_small_cloud(rng):
    coord = rng.rand(100, 3).astype(np.float32)
    feat = rng.rand(100, 3).astype(np.float32)
    label = rng.randint(0, 5, (100, 1)).astype(np.int64)
    c, f, l = crop_pc(coord, feat, label, 'train', None, 256,
                      downsample=False, variable=False)
    assert len(c) == 256


def test_transforms_compose(rng):
    cfg = {
        "train": ["ChromaticAutoContrast", "PointsToTensor", "PointCloudScaling",
                  "PointCloudXYZAlign", "PointCloudRotation", "PointCloudJitter",
                  "ChromaticDropGPU", "ChromaticNormalize"],
        "val": ["PointsToTensor", "PointCloudXYZAlign", "ChromaticNormalize"],
        "kwargs": {"color_drop": 0.2, "gravity_dim": 2, "scale": [0.9, 1.1],
                   "angle": [0, 0, 1], "jitter_sigma": 0.005,
                   "jitter_clip": 0.02},
    }
    t = build_transforms_from_cfg("train", cfg)
    data = {"pos": rng.rand(500, 3).astype(np.float32) * 4,
            "x": (rng.rand(500, 3) * 255).astype(np.float32),
            "y": rng.randint(0, 13, 500)}
    out = t(data)
    assert out["pos"].shape == (500, 3)
    # XYZAlign: xy centered (approximately 0 mean after later transforms may
    # shift; just check finite + z handled), colors normalized
    assert np.all(np.isfinite(out["pos"]))
    assert out["x"][:, :3].max() < 10  # normalized scale


def test_synthetic_dataset_and_loader():
    ds = Synthetic(num_rooms=2, n_points=4000, voxel_max=512, loop=2,
                   split='train')
    assert len(ds) == 4
    sample = ds[0]
    assert sample["pos"].shape == (512, 3)
    assert sample["x"].shape == (512, 3)
    assert sample["heights"].shape == (512, 1)
    loader = NumpyLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["pos"].shape == (2, 512, 3)


def test_synthetic_hard_mode_properties():
    """The de-saturated gate data (VERDICT r3 weak #2): train-only
    boundary-concentrated label noise, clean val labels, aliased box
    colors, and default-mode rooms unchanged from the pre-hard generator
    (draw-order preserved)."""
    from amcontrast3d_tpu.data.synthetic import make_room

    rng = np.random.RandomState(5)
    pos, color, lab_noisy = make_room(rng, 12000, 13, hard=True,
                                      label_noise=True)
    rng2 = np.random.RandomState(5)
    pos2, color2, lab_clean = make_room(rng2, 12000, 13, hard=True,
                                        label_noise=False)
    np.testing.assert_array_equal(pos, pos2)
    np.testing.assert_array_equal(color, color2)  # colors follow CLEAN labels
    flipped = lab_noisy != lab_clean
    rate = flipped.mean()
    assert 0.003 < rate < 0.25, f"flip rate {rate} outside designed band"

    # noise is boundary-concentrated: flipped points sit much closer to an
    # other-class point than the average unflipped point does
    take = np.random.RandomState(0).choice(len(pos), 2048, replace=False)
    ref_p, ref_l = pos[take], lab_clean[take]

    def d_other(mask):
        pts, labs = pos[mask][:512], lab_clean[mask][:512]
        d2 = ((pts[:, None] - ref_p[None]) ** 2).sum(-1)
        d2[labs[:, None] == ref_l[None]] = np.inf
        return np.sqrt(d2.min(1))

    assert np.median(d_other(flipped)) < 0.5 * np.median(d_other(~flipped))

    # color aliasing: box classes (>=3) share 4 hues — classes 3 and 7 have
    # (near-)identical base colors in hard mode, distinct in default mode
    def mean_color(lab, col, c):
        m = lab == c
        return col[m].mean(0) if m.any() else None

    c3, c7 = mean_color(lab_clean, color, 3), mean_color(lab_clean, color, 7)
    if c3 is not None and c7 is not None:
        assert np.abs(c3 - c7).max() < 0.1  # same palette slot (+noise)

    # default mode: byte-identical rooms vs the pre-hard generator stream
    r1 = np.random.RandomState(11)
    p_a, c_a, l_a = make_room(r1, 6000, 13, hard=False)
    r2 = np.random.RandomState(11)
    p_b, c_b, l_b = make_room(r2, 6000, 13, hard=False, label_noise=True)
    np.testing.assert_array_equal(p_a, p_b)   # label_noise inert w/o hard
    np.testing.assert_array_equal(l_a, l_b)


def test_build_dataloader_from_cfg():
    cfg = {
        "common": {"NAME": "Synthetic", "num_rooms": 2, "n_points": 4000,
                   "voxel_size": 0.04},
        "train": {"split": "train", "voxel_max": 256, "loop": 2},
        "val": {"split": "val", "voxel_max": 256},
    }
    dt = {"train": ["PointCloudXYZAlign", "ChromaticNormalize"],
          "val": ["PointCloudXYZAlign", "ChromaticNormalize"],
          "kwargs": {"gravity_dim": 2}}
    loader = build_dataloader_from_cfg(2, cfg, None, dt, split="train")
    b = next(iter(loader))
    assert b["pos"].shape == (2, 256, 3)
    assert b["y"].shape == (2, 256)


def test_get_features_by_keys():
    data = {"pos": np.zeros((2, 8, 3)), "x": np.ones((2, 8, 3)),
            "heights": np.full((2, 8, 1), 2.0)}
    f = get_features_by_keys(data, "x,heights")
    assert f.shape == (2, 8, 4)
    assert np.all(f[..., -1] == 2.0)
