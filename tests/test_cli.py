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


def test_load_checkpoint_module_filter(tmp_path):
    """Tolerant (strict=False) checkpoint load with submodule filter
    (↔ ckpt_util.py:137-183 + the encoder-only finetune path,
    main_AA.py:229-232)."""
    from amcontrast3d_tpu.utils import EasyConfig
    from amcontrast3d_tpu.utils.ckpt import load_checkpoint, save_checkpoint

    cfg = EasyConfig()
    cfg.run_name = "unit"
    cfg.ckpt_dir = str(tmp_path)
    stored = {"params": {"encoder": {"w": np.ones((2, 2), np.float32)},
                         "head": {"w": np.full((3,), 2.0, np.float32)},
                         "extra": {"w": np.ones((4,), np.float32)}},
              "batch_stats": {"encoder": {"m": np.ones((2,), np.float32)}}}
    path = save_checkpoint(cfg, stored, epoch=7)

    template = {"params": {"encoder": {"w": np.zeros((2, 2), np.float32)},
                           "head": {"w": np.zeros((3,), np.float32)},
                           "new": {"w": np.zeros((5,), np.float32)}},
                "batch_stats": {"encoder": {"m": np.zeros((2,), np.float32)}}}
    # module filter: ONLY the encoder subtree is taken from the checkpoint
    got, epoch, _ = load_checkpoint(template, path, module="encoder")
    assert epoch == 7
    np.testing.assert_array_equal(got["params"]["encoder"]["w"],
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(got["params"]["head"]["w"], np.zeros(3))
    np.testing.assert_array_equal(got["batch_stats"]["encoder"]["m"],
                                  np.ones(2))
    # strict=False full load: matching keys land, template-only keys keep
    # their init, checkpoint-only keys are ignored
    got, _, _ = load_checkpoint(template, path)
    np.testing.assert_array_equal(got["params"]["head"]["w"],
                                  np.full(3, 2.0))
    np.testing.assert_array_equal(got["params"]["encoder"]["w"],
                                  np.ones((2, 2)))
    np.testing.assert_array_equal(got["params"]["new"]["w"], np.zeros(5))


def test_cli_finetune_modes(tiny_cfg, tmp_path):
    """Finetune mode family (↔ main_AA.py:229-241): any non-eval mode with a
    pretrained_path loads model weights (full model, or encoder-only when
    'encoder' is in the mode string) and then trains."""
    import glob

    from amcontrast3d_tpu.engine.cli import main_cli

    main_cli("aa", argv=["--cfg", tiny_cfg, "epochs=1"])
    latest = glob.glob(str(tmp_path / "log" / "synthetic" / "*" /
                           "checkpoint" / "*latest*.ckpt"))[0]
    res = main_cli("aa", argv=["--cfg", tiny_cfg, "mode=finetune",
                               f"pretrained_path={latest}", "epochs=1"])
    assert np.isfinite(res["best_val"])
    res = main_cli("aa", argv=["--cfg", tiny_cfg, "mode=finetune_encoder",
                               f"pretrained_path={latest}", "epochs=1"])
    assert np.isfinite(res["best_val"])


def test_freeze_re_freezes_params(tiny_cfg):
    """Frozen params stay bit-identical through a train step while the rest
    move (↔ requires_grad=False on encoder blocks, main_AA.py:239-241)."""
    import jax

    from amcontrast3d_tpu.data import build_dataloader_from_cfg
    from amcontrast3d_tpu.engine.runner import Runner, _prep_batch
    from amcontrast3d_tpu.utils import EasyConfig

    cfg = EasyConfig()
    cfg.load(tiny_cfg, recursive=True)
    cfg.mode = "finetune_freeze_blocks"
    cfg.freeze_re = "encoder"  # freeze the whole encoder for the assertion
    runner = Runner(cfg, kind="aa")
    loader = build_dataloader_from_cfg(cfg.batch_size, cfg.dataset, None,
                                       cfg.datatransforms, split="train",
                                       seed=0)
    cfg.steps_per_epoch = 1
    batch = _prep_batch(next(iter(loader)), cfg)
    state = runner.build_state(batch)
    before = jax.tree_util.tree_map(np.asarray, state.params)
    step = runner.train_step_fn()
    state2, _ = step(state, jax.device_put(batch), jax.random.PRNGKey(0))
    after = jax.tree_util.tree_map(np.asarray, state2.params)

    for b, a in zip(jax.tree_util.tree_leaves(before["encoder"]),
                    jax.tree_util.tree_leaves(after["encoder"])):
        np.testing.assert_array_equal(b, a)
    moved = any(np.any(b != a) for b, a in
                zip(jax.tree_util.tree_leaves(before["head"]),
                    jax.tree_util.tree_leaves(after["head"])))
    assert moved, "head params did not move"
