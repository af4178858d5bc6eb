"""CLI bootstrap shared by the three trainers.

Contract identical to the reference (``README.md:61-84``, ``main_AA.py:806-865``):

    python examples/segmentation/main_AA.py --cfg cfgs/s3dis/AMContrast3D-AA.yaml \
        [--mode=train|resume|val|test] [any.cfg.key=value ...]

The torch version spawns one process per GPU here everything is one SPMD
process over the local device mesh, so ``main()`` is called directly.
"""
from __future__ import annotations

import argparse
import logging
import os

from ..utils import (EasyConfig, generate_exp_directory, resume_exp_directory,
                     setup_logger_dist)
from .runner import Runner


def parse_args(argv=None):
    parser = argparse.ArgumentParser("amcontrast3d_tpu segmentation trainer")
    parser.add_argument("--cfg", type=str, required=True, help="config file")
    parser.add_argument("--profile", action="store_true", default=False)
    args, opts = parser.parse_known_args(argv)
    return args, opts


def load_cfg(args, opts) -> EasyConfig:
    cfg = EasyConfig()
    cfg.load(args.cfg, recursive=True)
    cfg.update(opts)
    if cfg.get("seed") is None:
        import random
        cfg.seed = random.randint(1, 10000)
    cfg.cfg_basename = os.path.splitext(os.path.basename(args.cfg))[0]
    cfg.cfg_path = args.cfg
    return cfg


def main_cli(kind: str, argv=None):
    args, opts = parse_args(argv)
    cfg = load_cfg(args, opts)

    mode = cfg.get("mode", "train")
    if mode == "resume" and cfg.get("pretrained_path"):
        resume_exp_directory(cfg, cfg.pretrained_path)
    else:
        import jax
        tags = [cfg.cfg_basename, f"ngpus{len(jax.devices())}",
                f"seed{cfg.seed}"]
        generate_exp_directory(cfg, exp_name=tags)
    setup_logger_dist(cfg.run_dir, 0, name=cfg.cfg_basename)

    # snapshot the resolved config into the run dir (main_AA.py:847-851)
    import yaml
    with open(os.path.join(cfg.run_dir, "cfg.yaml"), "w") as f:
        yaml.safe_dump(cfg.dict(), f)

    runner = Runner(cfg, kind=kind)
    # any non-eval mode trains: 'train', 'resume', and the finetune family
    # ('finetune', 'finetune_encoder', '*freeze_blocks*' — main_AA.py:229-241)
    if mode not in ("val", "val_train", "test"):
        if args.profile:
            # TPU-native tracing (↔ examples/profile.py's deepspeed profiler):
            # a jax.profiler trace of the first epochs, viewable in
            # TensorBoard / Perfetto.
            import jax
            with jax.profiler.trace(os.path.join(cfg.run_dir, "profile")):
                state, results = runner.train()
        else:
            state, results = runner.train()
        logging.info("Training done: %s", results)
        return results
    if mode in ("val", "val_train", "test"):
        from ..data import build_dataloader_from_cfg
        from ..utils.ckpt import load_checkpoint

        split = "train" if mode == "val_train" else \
            ("val" if mode == "val" else "test")
        loader = build_dataloader_from_cfg(
            cfg.get("val_batch_size", 1), cfg.dataset, cfg.get("dataloader"),
            cfg.get("datatransforms"), split=split, seed=cfg.seed)
        first = next(iter(loader))
        from .runner import _prep_batch
        cfg.steps_per_epoch = 1
        state = runner.build_state(_prep_batch(first, cfg))
        best_epoch = "-"
        if cfg.get("pretrained_path"):
            restored, epoch, _ = load_checkpoint(
                {"params": state.params, "batch_stats": state.batch_stats,
                 "opt_state": state.opt_state}, cfg.pretrained_path)
            state = state.replace(params=restored["params"],
                                  batch_stats=restored["batch_stats"])
            best_epoch = epoch if epoch is not None else "-"
        if mode == "test":
            # whole-scene voting test (↔ test_boundary_inner, main_AA.py:516)
            from .evaluate import generate_data_list, test_whole_scenes
            data_list = generate_data_list(cfg)
            results = test_whole_scenes(runner, state, data_list, cfg)
            logging.info("test: mIoU %.2f mACC %.2f OA %.2f",
                         results["miou"], results["macc"], results["oa"])
            if "boundary" in results:
                logging.info("boundary mIoU/mACC/OA: %s", results["boundary"])
                logging.info("inner mIoU/mACC/OA: %s", results["inner"])
            # results CSV next to the run dir (↔ main_AA.py:224-225,346)
            from ..utils import write_to_csv
            cfg.csv_path = os.path.join(cfg.run_dir,
                                        cfg.run_name + "_test.csv")
            write_to_csv(results["oa"], results["macc"], results["miou"],
                         results["ious"], best_epoch, cfg,
                         area=cfg.dataset.common.get("test_area", 5)
                         if "dataset" in cfg else 5)
            logging.info("save results in %s", cfg.csv_path)
            return results
        miou, macc, oa, ious, accs = runner.validate(state, loader)
        logging.info("%s: mIoU %.2f mACC %.2f OA %.2f", mode, miou, macc, oa)
        return {"miou": miou, "macc": macc, "oa": oa}
