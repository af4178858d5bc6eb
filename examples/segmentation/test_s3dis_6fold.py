"""6-fold S3DIS cross-validation (↔ reference test_s3dis_6fold.py:112-169).

Loops test areas 1–6, loading the per-area best checkpoint and accumulating
ONE global confusion matrix across all areas.

    python examples/segmentation/test_s3dis_6fold.py --cfg cfgs/s3dis/AMContrast3D-AA.yaml \
        pretrained_root=log/s3dis
"""
import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "../.."))

import numpy as np

from amcontrast3d_tpu.engine.cli import load_cfg
from amcontrast3d_tpu.engine.evaluate import generate_data_list, test_whole_scenes
from amcontrast3d_tpu.engine.runner import Runner, _prep_batch
from amcontrast3d_tpu.data import build_dataloader_from_cfg
from amcontrast3d_tpu.utils import (ConfusionMatrix, get_mious,
                                    load_checkpoint, setup_logger_dist)


def find_checkpoint(pretrained_root, area):
    """Locate the *_ckpt_best for a given test area under the log root."""
    import glob
    pats = [os.path.join(pretrained_root, f"*Area{area}*", "checkpoint", "*_ckpt_best.ckpt"),
            os.path.join(pretrained_root, f"*area{area}*", "checkpoint", "*_ckpt_best.ckpt"),
            os.path.join(pretrained_root, "*", "checkpoint", "*_ckpt_best.ckpt")]
    for p in pats:
        hits = sorted(glob.glob(p))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no checkpoint for area {area} under {pretrained_root}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", type=str, required=True)
    args, opts = parser.parse_known_args()
    cfg = load_cfg(args, opts)
    setup_logger_dist(None, 0, "6fold")
    pretrained_root = cfg.get("pretrained_root", "log/s3dis")

    all_cm = ConfusionMatrix(cfg.num_classes, cfg.get("ignore_index"))
    kind = {"BaseSeg": "base", "BaseSeg_AMContrast3D": "aa",
            "BaseSeg_M_AMContrast3D": "mm"}[cfg.model.NAME]
    for area in range(1, 7):
        cfg.dataset.common.test_area = area
        cfg.mode = "test"
        runner = Runner(cfg, kind=kind)
        loader = build_dataloader_from_cfg(
            1, cfg.dataset, cfg.get("dataloader"), cfg.get("datatransforms"),
            split="val", seed=cfg.seed)
        cfg.steps_per_epoch = 1
        state = runner.build_state(_prep_batch(next(iter(loader)), cfg))
        ckpt = find_checkpoint(pretrained_root, area)
        restored, _, _ = load_checkpoint(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state}, ckpt)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        data_list = generate_data_list(cfg)
        results = test_whole_scenes(runner, state, data_list, cfg)
        logging.info("Area %d: mIoU %.2f mACC %.2f OA %.2f", area,
                     results["miou"], results["macc"], results["oa"])
        all_cm.value += results["cm"].value

    miou, macc, oa, ious, accs = get_mious(all_cm.tp, all_cm.union, all_cm.count)
    logging.info("6-fold: mIoU %.2f mACC %.2f OA %.2f", miou, macc, oa)
    logging.info("per-class IoU: %s", np.round(ious, 2))


if __name__ == "__main__":
    main()
