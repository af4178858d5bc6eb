"""Whole-scene voting test + boundary/ambiguity metrics on synthetic rooms."""
import numpy as np
import pytest

from amcontrast3d_tpu.engine.evaluate import (ambiguity_for_cloud,
                                              ambiguity_metrics,
                                              generate_data_list, load_data,
                                              posmask_searching)
from amcontrast3d_tpu.engine.evaluate import test_whole_scenes as run_whole_scenes
from amcontrast3d_tpu.engine.runner import Runner, _prep_batch
from amcontrast3d_tpu.utils import ConfusionMatrix, EasyConfig

from test_models import APM_ARGS, CLS_ARGS, ENCODER_ARGS


def _cfg():
    cfg = EasyConfig()
    cfg.update({
        "dataset": {
            "common": {"NAME": "Synthetic", "num_rooms": 1, "n_points": 3000,
                       "voxel_size": 0.1},
            "train": {"split": "train", "voxel_max": 512, "loop": 1},
            "val": {"split": "val", "voxel_max": 512},
            "test": {"split": "val", "voxel_max": None},
        },
        "feature_keys": "x,heights",
        "num_classes": 13,
        "batch_size": 2,
        "val_batch_size": 1,
        "eval_bucket": 512,
        "ignore_index": None,
        "epochs": 1,
        "sched": "cosine", "lr": 0.01, "min_lr": 1e-5,
        "optimizer": {"NAME": "adamw", "weight_decay": 1e-4},
        "grad_norm_clip": 10,
        "datatransforms": {
            "train": ["PointCloudXYZAlign", "ChromaticNormalize"],
            "val": ["PointCloudXYZAlign", "ChromaticNormalize"],
            "kwargs": {"gravity_dim": 2},
        },
        "ambiguity_args": {"nsample": 8, "ccbeta": 0.04, "cctype": "Method2",
                           "temperature": 0.3, "supervisedCL": "Method1",
                           "db": "-m", "margin": "adaptive", "mu": -1,
                           "nu": 0.5, "w1": 0.1, "w2": 0.9, "stages": "up",
                           "stages_num": 4, "miou_B_I": True, "action": True},
        "model": {"NAME": "BaseSeg_AMContrast3D",
                  "encoder_args": ENCODER_ARGS,
                  "decoder_args": {"NAME": "PointNextDecoder_AMContrast3D"},
                  "cls_args": CLS_ARGS},
        "distributed": False,
    })
    return cfg


def test_load_data_subclouds():
    cfg = _cfg()
    data_list = generate_data_list(cfg)
    assert len(data_list) == 1
    coord, feat, label, idx_points, voxel_idx, _, _ = load_data(data_list[0], cfg)
    # multi_voxel: union of subclouds covers indices; each subcloud = 1/voxel
    n_vox = voxel_idx.max() + 1
    for part in idx_points:
        assert len(part) == n_vox
    covered = np.unique(np.concatenate(idx_points))
    assert len(covered) == len(coord)


def test_posmask_and_ambiguity_metrics(rng):
    xyz = rng.rand(200, 3).astype(np.float32)
    target = (xyz[:, 0] > 0.5).astype(np.int64)
    posmask, idx = posmask_searching(xyz, target, 8, 2, None)
    assert posmask.shape == (200, 7)
    a = ambiguity_for_cloud(xyz, posmask, idx, "Method2", 0.04)
    assert np.all((a >= 0) & (a <= 1))
    pred = target.copy()
    cms = [ConfusionMatrix(2) for _ in range(5)]
    res = ambiguity_metrics(a, target, pred, 0.5, cms)
    assert len(res["miou"]) == 5
    assert abs(sum(res["count_pct"]) - 100.0) < 0.5


def test_whole_scene_voting_end_to_end(rng):
    cfg = _cfg()
    runner = Runner(cfg, kind="aa")
    from amcontrast3d_tpu.data import build_dataloader_from_cfg
    loader = build_dataloader_from_cfg(1, cfg.dataset, None,
                                       cfg.datatransforms, split="val")
    cfg.steps_per_epoch = 1
    state = runner.build_state(_prep_batch(next(iter(loader)), cfg))
    data_list = generate_data_list(cfg)
    results = run_whole_scenes(runner, state, data_list, cfg)
    assert np.isfinite(results["miou"])
    assert "boundary" in results and "inner" in results
    assert "ambiguity" in results
    # every point voted exactly once per containing subcloud
    assert results["cm"].total > 0


def test_whole_scene_sharded_matches_serial(rng):
    """Multi-device whole-scene test (subclouds sharded over the mesh) must
    reproduce the single-device voting result — a capability the reference
    explicitly lacks (multi-GPU testing disallowed, main_AA.py:362-363)."""
    from amcontrast3d_tpu.data import build_dataloader_from_cfg

    cfg = _cfg()
    cfg.ambiguity_args.miou_B_I = False
    cfg.ambiguity_args.action = False
    data_list = generate_data_list(cfg)

    results = {}
    for dist in (False, True):
        cfg_leg = EasyConfig()
        cfg_leg.update({**cfg, "distributed": dist})
        runner = Runner(cfg_leg, kind="aa")
        loader = build_dataloader_from_cfg(1, cfg_leg.dataset, None,
                                           cfg_leg.datatransforms, split="val")
        cfg_leg.steps_per_epoch = 1
        state = runner.build_state(_prep_batch(next(iter(loader)), cfg_leg))
        if dist:
            assert runner.mesh is not None and runner.mesh.devices.size == 8
        results[dist] = run_whole_scenes(runner, state, data_list, cfg_leg)

    # same params (same seed) → identical confusion matrices
    assert np.array_equal(results[False]["cm"].value,
                          results[True]["cm"].value)
    assert results[False]["miou"] == results[True]["miou"]


def test_validate_boundary_inner_path(rng):
    """Runner validation with the miou_B_I flag (↔ validate_boundary_inner,
    main_AA.py:431-513)."""
    cfg = _cfg()
    cfg.ambiguity_args.miou_B_I = True
    runner = Runner(cfg, kind="aa")
    from amcontrast3d_tpu.data import build_dataloader_from_cfg
    loader = build_dataloader_from_cfg(1, cfg.dataset, None,
                                       cfg.datatransforms, split="val")
    cfg.steps_per_epoch = 1
    state = runner.build_state(_prep_batch(next(iter(loader)), cfg))
    miou, macc, oa, _, _ = runner.validate_boundary_inner(state, loader)
    assert np.isfinite(miou) and np.isfinite(oa)
