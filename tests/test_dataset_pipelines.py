"""Real dataset code paths over fabricated raw files: S3DIS .npy rooms,
sphere dataset, SemanticKITTI .bin/.label scans, whole-scene test loader."""
import os

import numpy as np
import pytest

from amcontrast3d_tpu.data import S3DIS, S3DISSphere, SemanticKITTI
from amcontrast3d_tpu.data.synthetic import make_room
from amcontrast3d_tpu.utils import EasyConfig


@pytest.fixture
def s3dis_root(tmp_path):
    rng = np.random.RandomState(0)
    raw = tmp_path / "s3disfull" / "raw"
    raw.mkdir(parents=True)
    for name in ["Area_1_office_1", "Area_5_office_1", "Area_5_office_2"]:
        pos, color, label = make_room(rng, 4000)
        arr = np.hstack([pos, color * 255.0, label[:, None].astype(np.float32)])
        np.save(raw / f"{name}.npy", arr)
    return str(tmp_path / "s3disfull")


def test_s3dis_dataset_train_val(s3dis_root):
    train = S3DIS(data_root=s3dis_root, test_area=5, voxel_size=0.04,
                  voxel_max=512, split="train", loop=2)
    assert len(train) == 2  # 1 non-area5 room x loop 2
    d = train[0]
    assert d["pos"].shape == (512, 3)
    assert d["x"].shape == (512, 3)
    assert d["y"].shape == (512,)
    assert d["heights"].shape == (512, 1)

    val = S3DIS(data_root=s3dis_root, test_area=5, voxel_size=0.04,
                voxel_max=None, split="val", presample=True)
    assert len(val) == 2
    d = val[0]
    assert d["pos"].shape[0] == d["y"].shape[0]
    # presample pickle cache created and reloadable
    val2 = S3DIS(data_root=s3dis_root, test_area=5, voxel_size=0.04,
                 voxel_max=None, split="val", presample=True)
    assert len(val2.data) == 2


def test_s3dis_sphere_dataset(s3dis_root):
    ds = S3DISSphere(data_root=s3dis_root, test_area=5, voxel_size=0.08,
                     in_radius=1.5, num_points=256, num_steps=6,
                     split="train")
    assert len(ds) == 6
    seen_points = set()
    for i in range(3):
        d = ds[i]
        assert d["pos"].shape == (256, 3)
        assert d["y"].shape == (256,)
        seen_points.update(d["point_idx"].tolist())
    assert len(seen_points) > 256  # potentials move spheres around


def test_s3dis_whole_scene_loader(s3dis_root):
    from amcontrast3d_tpu.engine.evaluate import generate_data_list, load_data

    cfg = EasyConfig()
    cfg.update({"dataset": {"common": {"NAME": "S3DIS",
                                       "data_root": s3dis_root,
                                       "test_area": 5,
                                       "voxel_size": 0.08},
                            "test": {"split": "test"}}})
    data_list = generate_data_list(cfg)
    assert len(data_list) == 2
    coord, feat, label, idx_points, voxel_idx, _, _ = load_data(data_list[0], cfg)
    covered = np.unique(np.concatenate(idx_points))
    assert len(covered) == len(coord)
    assert feat.max() <= 1.0 + 1e-6


def test_semantickitti_dataset(tmp_path):
    rng = np.random.RandomState(0)
    seq = tmp_path / "sequences" / "00"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    for i in range(2):
        pts = rng.randn(1000, 4).astype(np.float32) * 10
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
        # raw semantic ids from the real label set
        raw_ids = np.array([0, 10, 40, 48, 70, 81], dtype=np.uint32)
        labels = raw_ids[rng.randint(0, len(raw_ids), 1000)].astype(np.uint32)
        labels.tofile(seq / "labels" / f"{i:06d}.label")
    ds = SemanticKITTI(data_root=str(tmp_path), split="train",
                       voxel_size=0.2, voxel_max=256)
    d = ds[0]
    assert d["pos"].shape == (256, 3)
    # remap: 0→-1 (ignore), 10→0(car), 40→8(road), 48→10, 70→14, 81→18
    assert set(np.unique(d["y"])).issubset({-1, 0, 8, 10, 14, 18})


def test_semantickitti_preprocess_cache(tmp_path):
    """RandLA-style cache builder (tools/prepare_semantickitti.py ↔
    reference preprocess/data_pre.py:188-242): grid subsample + KD-tree +
    raw→sub projection, and the loader's presampled_root consumption."""
    import pickle
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.prepare_semantickitti import prepare_sequence

    rng = np.random.RandomState(3)
    seq = tmp_path / "sequences" / "08"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "labels").mkdir()
    n_raw = 1500
    for i in range(2):
        pts = (rng.randn(n_raw, 4).astype(np.float32)
               * np.array([10, 10, 2, 1], np.float32))
        pts.tofile(seq / "velodyne" / f"{i:06d}.bin")
        raw_ids = np.array([0, 10, 40, 48, 70, 81], dtype=np.uint32)
        labels = raw_ids[rng.randint(0, len(raw_ids), n_raw)].astype(
            np.uint32)
        labels.tofile(seq / "labels" / f"{i:06d}.label")

    out = tmp_path / "cache"
    prepare_sequence(str(seq), str(out / "08"), "08", 0.3,
                     log=lambda *a: None)

    # cache files exist and are consistent
    sub = np.load(out / "08" / "velodyne" / "000000.npy")
    sub_lab = np.load(out / "08" / "y" / "000000.npy")
    assert sub.ndim == 2 and sub.shape[1] == 3 and len(sub) < n_raw
    assert len(sub_lab) == len(sub)
    assert sub_lab.min() >= 0 and sub_lab.max() <= 19  # 0=unlabeled space
    with open(out / "08" / "KDTree" / "000000.pkl", "rb") as f:
        tree = pickle.load(f)
    np.testing.assert_array_equal(tree["points"], sub)
    with open(out / "08" / "proj" / "000000_proj.pkl", "rb") as f:
        proj = pickle.load(f)[0]
    assert proj.shape == (n_raw,)
    # projection is the exact 1-NN: check against brute force on a sample
    from amcontrast3d_tpu.data.semantickitti import load_pc_kitti
    raw = load_pc_kitti(str(seq / "velodyne" / "000000.bin"))
    take = rng.choice(n_raw, 64, replace=False)
    d2 = ((raw[take, None, :] - sub[None, :, :]) ** 2).sum(-1)
    want = np.argmin(d2, axis=1)
    got_d = d2[np.arange(64), proj[take]]
    min_d = d2[np.arange(64), want]
    np.testing.assert_allclose(got_d, min_d, rtol=1e-5)  # ties allowed

    # loader consumes the cache (no runtime re-voxelize)
    ds = SemanticKITTI(data_root=str(tmp_path), split="val",
                       voxel_size=0.3, voxel_max=128,
                       presampled_root=str(out))
    d = ds[0]
    assert d["pos"].shape == (128, 3)
    assert set(np.unique(d["y"])).issubset({-1, 0, 8, 10, 14, 18})
    pc_path = ds.data_list[0][0]
    pj = ds.projection_indices(pc_path)
    assert pj.shape == (n_raw,) and pj.max() < len(sub)


def test_scannet_dataset(tmp_path):
    import torch
    from amcontrast3d_tpu.data import ScanNet
    rng = np.random.RandomState(1)
    (tmp_path / "train").mkdir()
    for i in range(2):
        coord = rng.randn(2000, 3).astype(np.float32) * 3
        feat = (rng.rand(2000, 3).astype(np.float32) * 2 - 1)  # [-1, 1]
        label = rng.randint(-1, 20, 2000).astype(np.int64)
        label[label < 0] = -100
        torch.save((coord, feat, label), tmp_path / "train" / f"scene{i}.pth")
    ds = ScanNet(data_root=str(tmp_path), split="train", voxel_size=0.05,
                 voxel_max=256)
    d = ds[0]
    assert d["pos"].shape == (256, 3)
    assert d["x"].shape == (256, 3)
    assert d["x"].max() <= 255.0 and d["x"].min() >= 0.0
    assert set(np.unique(d["y"])).issubset(set(range(20)) | {-100})


def test_validate_sphere_protocol(s3dis_root):
    """Sphere-protocol validation: per-cloud logit accumulation
    (↔ validate_sphere, main.py:437-508)."""
    import jax
    from amcontrast3d_tpu.data import NumpyLoader
    from amcontrast3d_tpu.engine.runner import Runner, _prep_batch
    from test_models import CLS_ARGS

    enc_args = dict(NAME="PointNextEncoder", blocks=[1, 1, 1],
                    strides=[1, 2, 2], width=8, in_channels=4, sa_layers=1,
                    radius=0.5, nsample=8,
                    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
                    group_args={"NAME": "ballquery"},
                    norm_args={"norm": "bn"}, act_args={"act": "relu"})
    cfg = EasyConfig()
    cfg.update({
        "dataset": {"common": {"NAME": "S3DISSphere",
                               "data_root": s3dis_root, "test_area": 5,
                               "voxel_size": 0.08, "in_radius": 1.5,
                               "num_points": 128, "num_steps": 4,
                               "num_epochs": 1}},
        "feature_keys": "x,heights", "num_classes": 13,
        "sched": "cosine", "lr": 0.01, "min_lr": 1e-5, "epochs": 1,
        "optimizer": {"NAME": "adamw", "weight_decay": 1e-4},
        "model": {"NAME": "BaseSeg", "encoder_args": enc_args,
                  "decoder_args": {"decoder_stages": 2},
                  "cls_args": CLS_ARGS},
        "distributed": False, "steps_per_epoch": 1,
    })
    runner = Runner(cfg, kind="base")
    from amcontrast3d_tpu.data import build_dataset_from_cfg
    ds = build_dataset_from_cfg(cfg.dataset.common, {}, transform=None)
    loader = NumpyLoader(ds, 2)
    state = runner.build_state(_prep_batch(next(iter(loader)), cfg))
    miou, macc, oa, _, _ = runner.validate_sphere(state, loader)
    assert np.isfinite(oa)


@pytest.fixture
def kitti_root(tmp_path):
    rng = np.random.RandomState(7)
    raw_ids = np.array([0, 10, 40, 48, 70, 81], dtype=np.uint32)
    for seq in ("08", "11"):
        d = tmp_path / "sequences" / seq
        (d / "velodyne").mkdir(parents=True)
        (d / "labels").mkdir()
        for i in range(2):
            pts = (rng.rand(3000, 4).astype(np.float32) * 8)
            pts.tofile(d / "velodyne" / f"{i:06d}.bin")
            labels = raw_ids[rng.randint(0, len(raw_ids), 3000)].astype(np.uint32)
            labels.tofile(d / "labels" / f"{i:06d}.label")
    return str(tmp_path)


def test_semantickitti_whole_scene_eval(kitti_root, tmp_path):
    """End-to-end kitti test path: generate_data_list → load_data →
    voxel-rank voting → CM + benchmark .label export
    (↔ main_AA.py:60-65, 85-88, 736-743)."""
    from amcontrast3d_tpu.data.semantickitti import remap_lut_write
    from amcontrast3d_tpu.engine.evaluate import (generate_data_list,
                                                  load_data)
    from amcontrast3d_tpu.engine.evaluate import \
        test_whole_scenes as run_whole_scenes
    from amcontrast3d_tpu.engine.runner import Runner
    from test_models import CLS_ARGS

    enc_args = dict(NAME="PointNextEncoder", blocks=[1, 1, 1],
                    strides=[1, 2, 2], width=8, in_channels=4, sa_layers=1,
                    radius=0.5, nsample=8,
                    aggr_args={"feature_type": "dp_fj", "reduction": "max"},
                    group_args={"NAME": "ballquery"},
                    norm_args={"norm": "bn"}, act_args={"act": "relu"})
    cls_args = dict(CLS_ARGS)
    cls_args["num_classes"] = 19
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    cfg = EasyConfig()
    cfg.update({
        "dataset": {"common": {"NAME": "SemanticKITTI",
                               "data_root": kitti_root,
                               "voxel_size": 0.5},
                    "test": {"split": "val", "test_id": 0}},
        "feature_keys": "pos,heights", "num_classes": 19,
        "ignore_index": -1, "eval_bucket": 512,
        "sched": "cosine", "lr": 0.01, "min_lr": 1e-5, "epochs": 1,
        "optimizer": {"NAME": "adamw", "weight_decay": 1e-4},
        "model": {"NAME": "BaseSeg", "encoder_args": enc_args,
                  "decoder_args": {"decoder_stages": 2},
                  "cls_args": cls_args},
        "distributed": False, "steps_per_epoch": 1,
        "save_pred": True, "run_dir": str(run_dir),
    })
    data_list = generate_data_list(cfg)
    assert len(data_list) == 2  # val = sequence 08
    coord, feat, label, idx_points, voxel_idx, _, _ = load_data(
        data_list[0], cfg)
    assert feat is None and label is not None
    assert set(np.unique(label)).issubset({-1, 0, 8, 10, 14, 18})
    covered = np.unique(np.concatenate(idx_points))
    assert len(covered) == len(coord)

    runner = Runner(cfg, kind="base")
    example = {"pos": np.zeros((1, 512, 3), np.float32),
               "x": np.zeros((1, 512, 4), np.float32),
               "y": np.zeros((1, 512), np.int64)}
    state = runner.build_state(example)
    results = run_whole_scenes(runner, state, data_list, cfg)
    assert np.isfinite(results["oa"])
    # benchmark export: uint32 raw ids via the write LUT
    preds = sorted((run_dir / "predictions").glob("*.label"))
    assert len(preds) == 2
    out = np.fromfile(preds[0], dtype=np.uint32)
    assert set(np.unique(out)).issubset(set(remap_lut_write.tolist()))

    # test split = sequence 11 (labels ignored)
    cfg.dataset.test.split = "test"
    test_list = generate_data_list(cfg)
    assert len(test_list) == 2
    coord, feat, label, *_ = load_data(test_list[0], cfg)
    assert label is None
