"""End-to-end training / validation / testing runner.

Host-side orchestration around the jitted steps in :mod:`engine.train` —
the TPU-native equivalent of ``examples/segmentation/main_AA.py:119-316``
(epoch loop, val-frequency checkpointing with latest/best semantics, resume,
final test).  One runner serves all three trainers ('base' ↔ main.py,
'aa' ↔ main_AA.py, 'mm' ↔ main_MM.py).
"""
from __future__ import annotations

import logging
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..data import build_dataloader_from_cfg, get_features_by_keys
from ..loss import build_criterion_from_cfg
from ..models import build_model_from_cfg
from ..parallel import get_mesh, replicate, shard_batch
from ..scheduler import as_step_schedule, build_scheduler_from_cfg
from ..utils import (AverageMeter, ConfusionMatrix, resume_checkpoint,
                     save_checkpoint, set_random_seed)
from ..utils.summary import SummaryWriter
from ..data.data_util import bucket_size, pad_cloud
from .train import (build_tx, create_train_state, make_eval_step,
                    make_predict_step, make_sharded_eval_step,
                    make_sharded_predict_step, make_sharded_train_step,
                    make_train_step)

KIND_TO_CRITERION_KEY = {"base": "criterion_args",
                         "aa": "criterion_args_Ace",
                         "mm": "criterion_args_AcePre"}


def _prep_batch(data: Dict[str, np.ndarray], cfg) -> Dict[str, np.ndarray]:
    return {
        "pos": np.asarray(data["pos"], np.float32),
        "x": np.asarray(get_features_by_keys(data, cfg.feature_keys), np.float32),
        "y": np.asarray(data["y"], np.int64),
    }


class Runner:
    def __init__(self, cfg, kind: str = "aa"):
        self.cfg = cfg
        self.kind = kind
        self.rng = set_random_seed(cfg.get("seed") or 0)

        n_dev = len(jax.devices())
        self.distributed = bool(cfg.get("distributed", n_dev > 1)) and n_dev > 1
        self.mesh = get_mesh() if self.distributed else None
        bn_axis = "dp" if self.distributed else None

        dtype = jnp.bfloat16 if cfg.get("use_amp", False) else jnp.float32
        model_cfg = dict(cfg.model)
        self.model = build_model_from_cfg(model_cfg, bn_axis_name=bn_axis,
                                          dtype=dtype)
        crit_cfg = cfg.get(KIND_TO_CRITERION_KEY[kind]) or {"NAME": "CrossEntropy"}
        self.criterion = build_criterion_from_cfg(crit_cfg)

        self.num_classes = int(cfg.num_classes)
        self.ignore_index = cfg.get("ignore_index", None)
        self.ambiguity_args = dict(cfg.get("ambiguity_args", {}) or {})

        lr_fn, self.epochs = build_scheduler_from_cfg(cfg)
        self.lr_fn = lr_fn
        self.plateau = None
        self._tx = None
        self._steps = {}

    # ------------------------------------------------------------------
    def _freeze_labels(self):
        """Param→{'trainable','frozen'} labeler for freeze-finetune modes
        (↔ ``'freeze_blocks' in cfg.mode`` freezing ``encoder.blocks``,
        main_AA.py:239-241).  ``cfg.freeze_re`` overrides the path regex."""
        import re
        pattern = self.cfg.get("freeze_re")
        if pattern is None and "freeze_blocks" in str(self.cfg.get("mode", "")):
            pattern = r"encoder/.*block"
        if not pattern:
            return None
        rx = re.compile(pattern)

        def labels(params):
            from flax.traverse_util import flatten_dict, unflatten_dict
            flat = flatten_dict(params)
            return unflatten_dict(
                {k: ("frozen" if rx.search("/".join(map(str, k)))
                     else "trainable") for k in flat})
        return labels

    def build_state(self, example_batch):
        steps_per_epoch = self.cfg.get("steps_per_epoch", 1)
        sched = as_step_schedule(self.lr_fn, steps_per_epoch,
                                 start_epoch=self.cfg.get("start_epoch", 1))
        opt_cfg = dict(self.cfg.get("optimizer", {"NAME": "adamw"}) or {})
        if opt_cfg.get("layer_decay") and "num_layers" not in opt_cfg:
            # ↔ model.get_num_layers() in the reference factory
            mcfg = dict(self.cfg.model)
            opt_cfg["num_layers"] = int(
                mcfg.get("depth", dict(mcfg.get("encoder_args", {}) or {})
                         .get("depth", 12)))
        self.plateau = getattr(self.lr_fn, "plateau", None)
        self._tx = build_tx(opt_cfg, sched, self.cfg.get("grad_norm_clip"),
                            plateau=self.plateau is not None,
                            param_labels=self._freeze_labels())
        state = create_train_state(self.model, self._tx, example_batch,
                                   self.rng)
        if self.distributed:
            state = replicate(state, self.mesh)
        return state

    def train_step_fn(self):
        if "train" not in self._steps:
            opt_name = str(dict(self.cfg.get("optimizer", {}) or {})
                           .get("NAME", "adamw")).lower()
            fn = make_train_step(self.model, self.criterion, self._tx,
                                 self.kind, self.num_classes,
                                 self.ignore_index, self.ambiguity_args,
                                 axis_name="dp" if self.distributed else None,
                                 needs_hessian=opt_name.endswith("adahessian"))
            if self.distributed:
                fn = make_sharded_train_step(fn, self.mesh)
            else:
                fn = jax.jit(fn, donate_argnums=(0,))
            self._steps["train"] = fn
        return self._steps["train"]

    def eval_step_fn(self, sharded: bool = False):
        key = ("eval", sharded)
        if key not in self._steps:
            fn = make_eval_step(self.model, self.kind, self.num_classes,
                                self.ignore_index,
                                axis_name="dp" if sharded else None)
            if sharded:
                fn = make_sharded_eval_step(fn, self.mesh)
            else:
                fn = jax.jit(fn)
            self._steps[key] = fn
        return self._steps[key]

    def predict_fn(self):
        """Jitted logits-only forward (host-scored eval paths)."""
        if "predict" not in self._steps:
            self._steps["predict"] = jax.jit(make_predict_step(self.model))
        return self._steps["predict"]

    def predict_sharded_fn(self):
        """Batch-sharded logits-only forward over the device mesh — lets the
        whole-scene test score ``n_devices`` subclouds per dispatch."""
        if "predict_sharded" not in self._steps:
            self._steps["predict_sharded"] = make_sharded_predict_step(
                make_predict_step(self.model), self.mesh)
        return self._steps["predict_sharded"]

    def put_batch(self, batch):
        if self.distributed:
            return shard_batch(batch, self.mesh)
        return jax.device_put(batch)

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        train_loader = build_dataloader_from_cfg(
            cfg.batch_size, cfg.dataset, cfg.get("dataloader"),
            cfg.get("datatransforms"), split="train",
            seed=cfg.get("seed") or 0)
        val_loader = build_dataloader_from_cfg(
            cfg.get("val_batch_size", 1), cfg.dataset, cfg.get("dataloader"),
            cfg.get("datatransforms"), split="val",
            seed=cfg.get("seed") or 0)
        cfg.steps_per_epoch = max(len(train_loader), 1)

        first = _prep_batch(next(iter(train_loader)), cfg)
        state = self.build_state(first)
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(state.params))
        logging.info("Number of params: %.4f M", n_params / 1e6)

        start_epoch = cfg.get("start_epoch", 1)
        mode = str(cfg.get("mode", "train"))
        if cfg.get("pretrained_path"):
            if mode == "resume":
                restored, _ = resume_checkpoint(cfg, {
                    "params": state.params, "batch_stats": state.batch_stats,
                    "opt_state": state.opt_state})
                state = state.replace(params=restored["params"],
                                      batch_stats=restored["batch_stats"],
                                      opt_state=restored["opt_state"])
                start_epoch = cfg.start_epoch
            else:
                # finetune (↔ main_AA.py:229-236): model weights only —
                # full model, or the encoder subtree when 'encoder' in mode
                from ..utils.ckpt import load_checkpoint
                module = "encoder" if "encoder" in mode else \
                    cfg.get("pretrained_module")
                logging.info("Finetuning from %s (module=%s)",
                             cfg.pretrained_path, module)
                restored, _, _ = load_checkpoint(
                    {"params": state.params,
                     "batch_stats": state.batch_stats},
                    cfg.pretrained_path, module=module)
                state = state.replace(params=restored["params"],
                                      batch_stats=restored["batch_stats"])
        else:
            logging.info("Training from scratch")

        step = self.train_step_fn()
        rngk = jax.random.PRNGKey((cfg.get("seed") or 0) + 1)
        if self.distributed:
            rngk = replicate(rngk, self.mesh)

        writer = SummaryWriter(cfg.get("run_dir"),
                               use_wandb=bool((cfg.get("wandb") or {}).get("use_wandb")),
                               wandb_cfg=cfg.get("wandb"))
        best_val, best_epoch = 0.0, 0
        val_miou = val_macc = val_oa = 0.0
        last_refine_rate = None
        for epoch in range(start_epoch, self.epochs + 1):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            loss_meter = AverageMeter()
            cm = ConfusionMatrix(self.num_classes, self.ignore_index)
            extra_meters: Dict[str, AverageMeter] = {}
            # keep a 2-step lag of device metrics so steps pipeline (a
            # per-step host fetch would serialize on the host↔device
            # round-trip) without buffering the whole epoch on device
            def _drain(m):
                loss_meter.update(float(m["loss"]))
                cm.update_matrix(m["cm"])
                for k, v in m.items():
                    if k.startswith("loss_") or k == "refine_rate":
                        extra_meters.setdefault(k, AverageMeter()).update(float(v))

            from collections import deque
            pending = deque()
            for data in train_loader:
                batch = self.put_batch(_prep_batch(data, cfg))
                state, metrics = step(state, batch, rngk)
                pending.append(metrics)
                if len(pending) > 2:
                    _drain(pending.popleft())
            while pending:
                _drain(pending.popleft())
            miou, macc, oa, _, _ = cm.all_metrics()
            lr = float(self.lr_fn(epoch))
            if self.plateau is not None:
                lr *= self.plateau.lr / self.plateau.base_lr
            extras = " ".join(f"{k} {m.avg:.4f}" for k, m in extra_meters.items())
            logging.info(
                "Epoch %d LR %.6f loss %.4f train_miou %.2f train_oa %.2f "
                "(%.1fs) %s", epoch, lr, loss_meter.avg, miou, oa,
                time.time() - t0, extras)

            is_best = False
            if epoch % cfg.get("val_freq", 1) == 0:
                if cfg.get("val_fn") == "validate_sphere":
                    validate_fn = self.validate_sphere
                elif dict(cfg.get("ambiguity_args", {}) or {}).get("miou_B_I"):
                    validate_fn = self.validate_boundary_inner
                else:
                    validate_fn = self.validate
                val_miou, val_macc, val_oa, _, _ = validate_fn(state, val_loader)
                if val_miou > best_val:
                    is_best, best_val, best_epoch = True, val_miou, epoch
                logging.info("Epoch %d val_miou %.2f (best %.2f @E%d)",
                             epoch, val_miou, best_val, best_epoch)
            if self.plateau is not None and epoch > self.cfg.get(
                    "warmup_epochs", 0):
                # host-side metric-driven LR step (↔ scheduler.step(epoch,
                # val_miou)); writes one scalar into opt_state
                from ..scheduler.plateau_lr import set_plateau_scale
                scale = self.plateau.step(val_miou)
                state = state.replace(opt_state=set_plateau_scale(
                    state.opt_state, scale))
            # per-epoch scalars (↔ main_AA.py:298-308 / main_MM.py:303-311)
            writer.add_scalar("train_loss", loss_meter.avg, epoch)
            writer.add_scalar("train_miou", miou, epoch)
            writer.add_scalar("train_macc", macc, epoch)
            writer.add_scalar("val_miou", val_miou, epoch)
            writer.add_scalar("best_val", best_val, epoch)
            writer.add_scalar("lr", lr, epoch)
            for k, m in extra_meters.items():
                writer.add_scalar(k, m.avg, epoch)
            if "refine_rate" in extra_meters:  # surfaced in results for the
                last_refine_rate = extra_meters["refine_rate"].avg  # gate
            if cfg.get("ckpt_dir"):
                save_checkpoint(cfg, {"params": state.params,
                                      "batch_stats": state.batch_stats,
                                      "opt_state": state.opt_state},
                                epoch, additioanl_dict={"best_val": best_val},
                                is_best=is_best)
        writer.close()
        results = {"best_val": best_val, "best_epoch": best_epoch,
                   "val_miou": val_miou, "val_macc": val_macc,
                   "val_oa": val_oa}
        if last_refine_rate is not None:
            # final-epoch mean DualMasks refine-rate % (MM only) — the
            # convergence gate asserts it stays in a sane band
            results["refine_rate"] = round(float(last_refine_rate), 3)
        return state, results

    # ------------------------------------------------------------------
    def validate(self, state, val_loader):
        """Whole-cloud validation with bucket padding (↔ validate,
        main_AA.py:431-513).  Padded duplicate points are sliced off on the
        host before the confusion-matrix update."""
        cfg = self.cfg
        predict = self.predict_fn()
        cm = ConfusionMatrix(self.num_classes, self.ignore_index)
        for data in val_loader:
            batch = _prep_batch(data, cfg)
            b, n = batch["y"].shape
            nb = bucket_size(n, cfg.get("eval_bucket", 8192))
            if nb != n:
                padded = []
                for i in range(b):
                    sample = {k: v[i] for k, v in batch.items()}
                    padded.append(pad_cloud(sample, nb))
                batch = {k: np.stack([p[k] for p in padded]) for k in
                         ("pos", "x", "y")}
            logits = np.asarray(predict(state, jax.device_put(batch)))[:, :n]
            pred = logits.argmax(-1)
            cm.update(pred, np.asarray(batch["y"])[:, :n])
        return cm.all_metrics()

    # ------------------------------------------------------------------
    def validate_boundary_inner(self, state, val_loader):
        """Validation with boundary/inner mIoU split (↔
        validate_boundary_inner, main_AA.py:431-513): boundary points are
        those whose kNN label neighborhood is mixed (posmask quirk included:
        ``0 < Σ posmask < nsample`` with Σ ≤ nsample−1)."""
        from .evaluate import posmask_searching

        cfg = self.cfg
        aargs = dict(cfg.get("ambiguity_args", {}) or {})
        predict = self.predict_fn()
        cm = ConfusionMatrix(self.num_classes, self.ignore_index)
        cm_b = ConfusionMatrix(self.num_classes, self.ignore_index)
        cm_i = ConfusionMatrix(self.num_classes, self.ignore_index)
        for data in val_loader:
            batch = _prep_batch(data, cfg)
            b, n = batch["y"].shape
            nb = bucket_size(n, cfg.get("eval_bucket", 8192))
            if nb != n:
                padded = [pad_cloud({k: v[i] for k, v in batch.items()}, nb)
                          for i in range(b)]
                batch = {k: np.stack([p[k] for p in padded])
                         for k in ("pos", "x", "y")}
            pred = np.asarray(predict(state, jax.device_put(batch)))[:, :n].argmax(-1)
            y = np.asarray(batch["y"])[:, :n]
            cm.update(pred, y)
            for i in range(b):
                posmask, _ = posmask_searching(
                    np.asarray(batch["pos"])[i, :n], y[i],
                    int(aargs.get("nsample", 24)), self.num_classes,
                    self.ignore_index)
                s = posmask.sum(-1)
                boundary = np.logical_and(0 < s, s < aargs.get("nsample", 24))
                cm_b.update(pred[i][boundary], y[i][boundary])
                cm_i.update(pred[i][~boundary], y[i][~boundary])
        miou, macc, oa, ious, accs = cm.all_metrics()
        b_metrics = cm_b.all_metrics()[:3]
        i_metrics = cm_i.all_metrics()[:3]
        logging.info("val boundary mIoU/mACC/OA: %.2f/%.2f/%.2f  "
                     "inner: %.2f/%.2f/%.2f", *b_metrics, *i_metrics)
        return miou, macc, oa, ious, accs

    # ------------------------------------------------------------------
    def validate_sphere(self, state, val_loader):
        """Sphere-protocol validation (↔ validate_sphere, main.py:437-508):
        accumulate per-cloud logits over all sampled spheres (scatter-add by
        subsampled point index — the cross-GPU all_reduce of the reference
        becomes a host accumulation), then score EVERY original point by
        projecting it to its nearest subsampled point (main.py:474-482).
        Unvisited subsampled points keep zero logits and argmax to class 0,
        exactly as the reference's scatter-mean leaves them."""
        cfg = self.cfg
        predict = self.predict_fn()
        ds = val_loader.dataset
        sizes = np.asarray([len(c[0]) for c in ds.clouds], np.int64)
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        vote = np.zeros((int(offsets[-1]), self.num_classes), np.float32)
        for data in val_loader:
            batch = _prep_batch(data, cfg)
            logits = np.asarray(predict(state, jax.device_put(batch)),
                                np.float32)
            cloud_idx = np.asarray(data["cloud_idx"]).reshape(-1)
            point_idx = np.asarray(data["point_idx"])
            flat_idx = (point_idx + offsets[cloud_idx][:, None]).ravel()
            flat_logits = logits.reshape(-1, self.num_classes)
            # per-class bincount is ~10x faster than np.add.at's buffered ufunc
            for c in range(self.num_classes):
                vote[:, c] += np.bincount(flat_idx,
                                          weights=flat_logits[:, c],
                                          minlength=len(vote))
        cm = ConfusionMatrix(self.num_classes, self.ignore_index)
        for ci, c in enumerate(ds.clouds):
            pred = vote[offsets[ci]:offsets[ci + 1]].argmax(-1)
            if getattr(ds, "projections", None) is not None:
                cm.update(pred[ds.projections[ci]], ds.raw_labels[ci])
            else:
                cm.update(pred, c[2])
        return cm.all_metrics()
