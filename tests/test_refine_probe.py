"""Refinement-sensitivity probe: the DualMasks path's END-METRIC effect is
falsifiable (VERDICT r4 next #2a).

Torch-transplant parity covers the refinement's *numerics*; this probe
covers its *effect*: train a small MM model on the HARD synthetic task,
then at eval corrupt the decoder features of exactly the high-ambiguity
points (the refinement's own self-mask, ground-truth AEF ambiguity) and
assert that DualMasks recovers measurably more val-mIoU than the same
model with refinement disabled (γ=0 equivalent).  If the refinement were
semantically inert — wrong mask, wrong neighbor selection, wrong blend —
the recovery vanishes and this test fails.
Match: ``openpoints/AMContrast3D/MaskedRefine.py:49-119``.
"""
import os

import numpy as np
import pytest
import yaml

NCLS = 13


@pytest.fixture
def mm_cfg(tmp_path):
    cfg = {
        "dataset": {
            "common": {"NAME": "Synthetic", "num_rooms": 3, "n_points": 3000,
                       "voxel_size": 0.04, "hard": True},
            "train": {"split": "train", "voxel_max": 512, "loop": 6},
            "val": {"split": "val", "voxel_max": 512},
            "test": {"split": "val", "voxel_max": 512},
        },
        "feature_keys": "x,heights",
        "num_classes": NCLS,
        "batch_size": 2,
        "val_batch_size": 2,
        "eval_bucket": 512,
        "epochs": 8,
        "val_freq": 2,
        "seed": 0,
        "criterion_args_AcePre": {"NAME": "CrossEntropyAcePre"},
        "sched": "cosine", "lr": 0.01, "min_lr": 1.0e-5,
        "optimizer": {"NAME": "adamw", "weight_decay": 1.0e-4},
        "grad_norm_clip": 10,
        "root_dir": str(tmp_path / "log"),
        "log_dir": "probe",
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
            "NAME": "BaseSeg_M_AMContrast3D",
            "encoder_args": {
                "NAME": "PointNextEncoder_M_AMContrast3D",
                "blocks": [1, 1, 1], "strides": [1, 4, 4], "sa_layers": 1,
                "sa_use_res": False, "width": 16, "in_channels": 4,
                "expansion": 4, "radius": 0.1, "nsample": 8,
                "aggr_args": {"feature_type": "dp_fj", "reduction": "max"},
                "group_args": {"NAME": "ballquery", "normalize_dp": True},
                "conv_args": {"order": "conv-norm-act"},
                "act_args": {"act": "relu"}, "norm_args": {"norm": "bn"},
            },
            "decoder_args": {"NAME": "PointNextDecoder_M_AMContrast3D",
                             "decoder_stages": 2},
            "cls_args": {"NAME": "SegHead", "num_classes": NCLS,
                         "in_channels": None, "norm_args": {"norm": "bn"}},
            "APM_args": {"NAME": "APM_pf_ConCate",
                         "feature_dim": [16, 32],
                         "linear_mapping": False, "cross_attention": False,
                         "feat_concate": False,
                         "channel": [32, 16, 8, 4, 2],
                         "dropout": [0, 0, 0, 0, 0],
                         "nsample_k": 8, "threshold": 0.6,
                         "threshold_max": 1.0, "gamma": 1, "fusion": "MIN",
                         "att_dim": 3},
        },
        "distributed": False,
    }
    cfg["model"]["AEF_args"] = dict(cfg["ambiguity_args"])
    path = tmp_path / "mm_probe.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(path)


def _eval_variant(model, variables, batches, corrupt: bool, refine_on: bool):
    """val mIoU/OA with the decoder's dual_masks call wrapped: optionally
    corrupt the self-masked (high-ambiguity) features first, then either
    run the real refinement or pass the features through (γ=0 analog)."""
    import jax
    import jax.numpy as jnp

    import amcontrast3d_tpu.models.refine as refine_mod
    from amcontrast3d_tpu.utils import ConfusionMatrix, get_mious

    real = _eval_variant._orig

    def wrapper(p, f, a, nsample_k, fusion, thr, thr_max, gamma):
        mask = jnp.logical_and(a >= thr, a <= thr_max)
        if corrupt:
            # destroy the masked points' features (sign flip: strongly
            # out-of-distribution after ReLU towers, unlike rolled rows
            # which stay spatially smooth)
            f = jnp.where(mask[..., None], -f, f)
        if refine_on:
            return real(p, f, a, nsample_k, fusion, thr, thr_max, gamma)
        return f, jnp.mean(mask.astype(jnp.float32)) * 100.0

    refine_mod.dual_masks = wrapper
    try:
        fn = jax.jit(lambda v, pos, x, y: model.apply(
            v, pos, x, training=False, target=y))
        cm = ConfusionMatrix(NCLS)
        rates = []
        for b in batches:
            logits, _, rate = fn(variables, b["pos"], b["x"],
                                 b["y"].astype(np.int32))
            cm.update(np.asarray(logits).argmax(-1).ravel(),
                      np.asarray(b["y"]).ravel())
            rates.append(float(rate))
    finally:
        refine_mod.dual_masks = real
    miou, macc, oa, _, _ = get_mious(cm.tp, cm.union, cm.count)
    return float(miou), float(oa), float(np.mean(rates))


def test_dualmasks_recovers_corrupted_boundary_features(mm_cfg, tmp_path):
    import glob

    import jax

    import amcontrast3d_tpu.models.refine as refine_mod
    from amcontrast3d_tpu.data import build_dataloader_from_cfg
    from amcontrast3d_tpu.engine.cli import main_cli
    from amcontrast3d_tpu.engine.runner import _prep_batch
    from amcontrast3d_tpu.models import build_model_from_cfg
    from amcontrast3d_tpu.utils import EasyConfig
    from amcontrast3d_tpu.utils.ckpt import load_checkpoint

    _eval_variant._orig = refine_mod.dual_masks

    # ---- train the small MM model on the hard rooms ---------------------
    results = main_cli("mm", argv=["--cfg", mm_cfg])
    assert np.isfinite(results["best_val"])
    best = glob.glob(str(tmp_path / "log" / "probe" / "*" / "checkpoint" /
                         "*best*.ckpt"))[0]

    cfg = EasyConfig()
    cfg.load(mm_cfg, recursive=True)

    # probe model: ground-truth (AEF) ambiguity drives the refinement so
    # "high-ambiguity points" is a deterministic, label-derived set
    mcfg = dict(cfg.model)
    mcfg["AEF_args"] = {**dict(mcfg["AEF_args"]), "source": "AEF"}
    model = build_model_from_cfg(mcfg)

    loader = build_dataloader_from_cfg(cfg.val_batch_size, cfg.dataset, None,
                                       cfg.datatransforms, split="val",
                                       seed=0)
    batches = [_prep_batch(b, cfg) for b in loader]
    assert batches and all(b["pos"].shape[1] == 512 for b in batches)

    variables = model.init(jax.random.PRNGKey(0), batches[0]["pos"],
                           batches[0]["x"], training=False)
    restored, _, _ = load_checkpoint(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]}, best)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    clean_miou, clean_oa, rate = _eval_variant(model, variables, batches,
                                               corrupt=False, refine_on=True)
    corr_ref_miou, corr_ref_oa, _ = _eval_variant(model, variables, batches,
                                                  corrupt=True,
                                                  refine_on=True)
    corr_off_miou, corr_off_oa, _ = _eval_variant(model, variables, batches,
                                                  corrupt=True,
                                                  refine_on=False)
    print(f"probe: clean {clean_miou:.2f}/{clean_oa:.2f}  "
          f"corrupt+refine {corr_ref_miou:.2f}/{corr_ref_oa:.2f}  "
          f"corrupt+off {corr_off_miou:.2f}/{corr_off_oa:.2f}  "
          f"refine_rate {rate:.1f}%")

    # the self-mask hits a real, non-degenerate share of points
    assert 1.0 < rate < 60.0, f"refine rate {rate:.1f}% out of sane band"
    # corruption must hurt the unrefined model (otherwise the probe is
    # vacuous) ...
    assert corr_off_oa < clean_oa - 1.0, (corr_off_oa, clean_oa)
    # ... and DualMasks must recover a measurable share of the damage
    assert corr_ref_miou > corr_off_miou + 1.0, (corr_ref_miou, corr_off_miou)
    assert corr_ref_oa > corr_off_oa + 1.0, (corr_ref_oa, corr_off_oa)
