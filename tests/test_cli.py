"""CLI integration: full train loop through main_cli on a tiny synthetic
config (the reference's 'integration testing = running the trainers',
SURVEY.md §4)."""
import os

import numpy as np
import pytest
import yaml


@pytest.fixture
def tiny_cfg(tmp_path):
    cfg = {
        "dataset": {
            "common": {"NAME": "Synthetic", "num_rooms": 2, "n_points": 3000,
                       "voxel_size": 0.04},
            "train": {"split": "train", "voxel_max": 256, "loop": 2},
            "val": {"split": "val", "voxel_max": 256},
            "test": {"split": "val", "voxel_max": 256},
        },
        "feature_keys": "x,heights",
        "num_classes": 13,
        "batch_size": 2,
        "val_batch_size": 2,
        "eval_bucket": 256,
        "epochs": 2,
        "val_freq": 1,
        "seed": 0,
        "sched": "cosine", "lr": 0.01, "min_lr": 1.0e-5,
        "optimizer": {"NAME": "adamw", "weight_decay": 1.0e-4},
        "grad_norm_clip": 10,
        "root_dir": str(tmp_path / "log"),
        "log_dir": "synthetic",
        "datatransforms": {
            "train": ["PointCloudXYZAlign", "ChromaticNormalize"],
            "val": ["PointCloudXYZAlign", "ChromaticNormalize"],
            "kwargs": {"gravity_dim": 2},
        },
        "ambiguity_args": {"action": False, "vis": False, "nsample": 8,
                           "ccbeta": 0.04, "cctype": "Method2",
                           "temperature": 0.3, "supervisedCL": "Method1",
                           "db": "-m", "margin": "adaptive", "mu": -1,
                           "nu": 0.5, "miou_B_I": False, "w1": 0.1,
                           "w2": 0.9, "w3": 0.01, "stages": "up",
                           "stages_num": 2, "source": "APM",
                           "source_mode": "Train"},
        "model": {
            "NAME": "BaseSeg_AMContrast3D",
            "encoder_args": {
                "NAME": "PointNextEncoder_AMContrast3D",
                "blocks": [1, 1, 1], "strides": [1, 4, 4], "sa_layers": 1,
                "sa_use_res": False, "width": 8, "in_channels": 4,
                "expansion": 4, "radius": 0.3, "nsample": 8,
                "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
                "group_args": {"NAME": "ballquery", "normalize_dp": True},
                "conv_args": {"order": "conv-norm-act"},
                "act_args": {"act": "relu"}, "norm_args": {"norm": "bn"},
            },
            "decoder_args": {"NAME": "PointNextDecoder_AMContrast3D",
                             "decoder_stages": 2},
            "cls_args": {"NAME": "SegHead", "num_classes": 13,
                         "in_channels": None, "norm_args": {"norm": "bn"}},
        },
        "distributed": False,
    }
    path = tmp_path / "tiny.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def test_cli_train_and_resume(tiny_cfg, tmp_path):
    from amcontrast3d_tpu.engine.cli import main_cli

    results = main_cli("aa", argv=["--cfg", tiny_cfg])
    assert np.isfinite(results["best_val"])
    # a latest and a best checkpoint were written
    import glob
    ckpts = glob.glob(str(tmp_path / "log" / "synthetic" / "*" /
                          "checkpoint" / "*.ckpt"))
    assert any("latest" in c for c in ckpts)
    assert any("best" in c for c in ckpts)

    # resume from latest for one more epoch
    latest = [c for c in ckpts if "latest" in c][0]
    results2 = main_cli("aa", argv=["--cfg", tiny_cfg, "mode=resume",
                                    f"pretrained_path={latest}", "epochs=3"])
    assert np.isfinite(results2["best_val"])


def test_cli_test_mode(tiny_cfg, tmp_path):
    from amcontrast3d_tpu.engine.cli import main_cli

    results = main_cli("aa", argv=["--cfg", tiny_cfg, "mode=test",
                                   "epochs=1"])
    assert np.isfinite(results["miou"])
    # per-class values are plain lists (artifact-serializable)
    assert isinstance(results["ious"], list) and len(results["ious"]) == 13
    # the results CSV row was appended next to the run dir
    # (↔ write_to_csv, main_AA.py:37-48,224-225)
    import csv
    import glob
    csvs = glob.glob(str(tmp_path / "log" / "synthetic" / "*" / "*_test.csv"))
    assert len(csvs) == 1, csvs
    rows = list(csv.reader(open(csvs[0])))
    assert rows[0][:5] == ["method", "Area", "OA", "mACC", "mIoU"]
    assert len(rows) == 2 and len(rows[1]) == len(rows[0])
    assert abs(float(rows[1][4]) - results["miou"]) < 0.01


def test_profile_grouper_microbench():
    """The grouper micro-benchmark (↔ reference examples/profile.py:108-126)
    runs and reports a throughput number."""
    import examples.profile as prof
    out = prof.profile_grouper(batch_size=1, num_points=512, n_runs=2)
    assert out["grouper_ins_per_sec"] > 0
