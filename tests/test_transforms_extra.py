"""Parity for the round-2 transforms (HueSaturationTranslation,
RandomScaleAndJitter, Cutmix) and the fork-inherited loader workers.

Transform oracles are the ACTUAL reference implementations (numpy, loaded
from /root/reference when present) driven by the same np.random stream.
"""
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

from amcontrast3d_tpu.data.build import NumpyLoader
from amcontrast3d_tpu.transforms import (Cutmix, DataTransforms,
                                         HueSaturationTranslation,
                                         RandomScaleAndJitter, mixup_target)

REF_T = "/root/reference/openpoints/transforms"
needs_ref = pytest.mark.skipif(not os.path.isdir(REF_T),
                               reason="reference checkout not available")


def _load_ref_cpu_transforms():
    if "reftrans.point_transform_cpu" in sys.modules:
        return sys.modules["reftrans.point_transform_cpu"]
    pkg = types.ModuleType("reftrans")
    pkg.__path__ = [REF_T]
    sys.modules["reftrans"] = pkg
    # stub the gpu module (its registry import chain needs the full openpoints
    # package); point_transform_cpu only needs DataTransforms from it
    gpu_stub = types.ModuleType("reftrans.point_transformer_gpu")

    class _Reg:
        def register_module(self, *a, **k):
            return lambda cls: cls

    gpu_stub.DataTransforms = _Reg()
    sys.modules["reftrans.point_transformer_gpu"] = gpu_stub
    spec = importlib.util.spec_from_file_location(
        "reftrans.point_transform_cpu",
        os.path.join(REF_T, "point_transform_cpu.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["reftrans.point_transform_cpu"] = mod
    spec.loader.exec_module(mod)
    return mod


@needs_ref
def test_hue_saturation_matches_reference():
    ref = _load_ref_cpu_transforms()
    rgb = np.random.RandomState(3).rand(500, 3).astype(np.float32) * 255.0
    np.random.seed(11)
    ours = HueSaturationTranslation(hue_max=0.5, saturation_max=0.2)(
        {"x": rgb.copy()})["x"]
    np.random.seed(11)
    theirs = ref.HueSaturationTranslation(hue_max=0.5, saturation_max=0.2)(
        {"x": rgb.copy()})["x"]
    np.testing.assert_array_equal(ours, theirs)


@needs_ref
def test_random_scale_and_jitter_matches_reference():
    ref = _load_ref_cpu_transforms()
    pos = np.random.RandomState(4).rand(300, 3).astype(np.float32)
    kw = dict(scale=[0.8, 1.2], scale_anisotropic=True,
              jitter_sigma=0.02, jitter_clip=0.05, mirror=[0.5, 0.5, -1])
    np.random.seed(7)
    ours = RandomScaleAndJitter(**kw)({"pos": pos.copy()})["pos"]
    np.random.seed(7)
    theirs = ref.RandomScaleAndJitter(**kw)({"pos": pos.copy()})["pos"]
    np.testing.assert_allclose(ours, np.asarray(theirs, np.float32),
                               atol=1e-6)


def test_transforms_registered():
    for name in ("HueSaturationTranslation", "RandomScaleAndJitter",
                 "Cutmix"):
        assert name in DataTransforms.module_dict


def test_cutmix_splices_and_mixes_target():
    np.random.seed(0)
    B, N, C, ncls = 4, 64, 3, 5
    pos = np.arange(B * N * 3, dtype=np.float32).reshape(B, N, 3)
    x = np.arange(B * N * C, dtype=np.float32).reshape(B, N, C)
    y = np.arange(B) % ncls
    orig_pos = pos.copy()
    cm = Cutmix(cutmix_alpha=0.9, num_classes=ncls, label_smoothing=0.0)
    data, target = cm({"pos": pos, "x": x}, y)
    # spliced tail comes from the batch-flipped clouds; head untouched
    n_mix = N - np.argmax(
        np.any(data["pos"][0] != orig_pos[0], axis=-1)) \
        if np.any(data["pos"][0] != orig_pos[0]) else 0
    if n_mix > 0:
        np.testing.assert_array_equal(data["pos"][0, -n_mix:],
                                      orig_pos[-1, -n_mix:])
        np.testing.assert_array_equal(data["pos"][0, :N - n_mix],
                                      orig_pos[0, :N - n_mix])
    # reference convention (point_transformer_gpu.py:442-461): lam·N points
    # are REPLACED yet the original target keeps weight lam
    assert target.shape == (B, ncls)
    np.testing.assert_allclose(target.sum(-1), 1.0, atol=1e-6)
    lam = n_mix / N  # int truncation makes this exact up to 1/N
    assert abs(float(target[0, y[0]]) - lam) <= 1.0 / N + 1e-6


def test_mixup_target_smoothing():
    y = np.array([0, 2])
    t = mixup_target(y, 3, lam=0.7, smoothing=0.1)
    on, off = 1.0 - 0.1 + 0.1 / 3, 0.1 / 3
    np.testing.assert_allclose(
        t[0], [0.7 * on + 0.3 * off, off, 0.3 * on + 0.7 * off], atol=1e-6)


class _NoPickleDataset:
    """Proves workers get the dataset via fork inheritance, not pickling."""

    def __init__(self, n=32):
        self.items = np.arange(n, dtype=np.int64)

    def __reduce__(self):
        raise RuntimeError("dataset must not be pickled into workers")

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return {"v": np.full((4,), self.items[i]),
                "r": np.random.rand(2)}


def test_loader_workers_fork_inherit_dataset():
    ds = _NoPickleDataset(32)
    loader = NumpyLoader(ds, batch_size=8, shuffle=False, num_workers=2,
                         prefetch=False)
    batches = list(loader)
    assert len(batches) == 4
    got = np.concatenate([b["v"][:, 0] for b in batches])
    np.testing.assert_array_equal(np.sort(got), np.arange(32))
    # per-worker RNG streams decorrelated by the pool initializer
    r = np.concatenate([b["r"].ravel() for b in batches])
    assert len(np.unique(np.round(r, 12))) > len(r) // 2
