"""Segmentation metrics.

``ConfusionMatrix``/``get_mious`` follow the semantics of the reference
(``openpoints/utils/metrics.py:51-199``) — bincount-based CM with an extra
virtual class for ``ignore_index``, per-class IoU/Acc in percent — but are
device-friendly: the per-batch update is a jittable pure function
(:func:`confusion_matrix_update`) so it can live inside the compiled train
step, and the host-side accumulator only sums integer matrices.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(pred, true, num_classes: int,
                            ignore_index: Optional[int] = None):
    """One-batch confusion matrix as a pure jittable function.

    Args:
      pred: int array, any shape — predicted class ids.
      true: int array, same shape — ground-truth class ids.
    Returns:
      ``(num_classes, num_classes)`` int32 matrix (rows = true, cols = pred).
    """
    virtual = num_classes + 1 if ignore_index is not None else num_classes
    true = true.reshape(-1).astype(jnp.int32)
    pred = pred.reshape(-1).astype(jnp.int32)
    if ignore_index is not None:
        ignore = true == ignore_index
        pred = jnp.where(ignore, virtual - 1, pred)
        true = jnp.where(ignore, virtual - 1, true)
    mapping = true * virtual + pred
    bins = jnp.bincount(mapping, length=virtual * virtual)
    return bins.reshape(virtual, virtual)[:num_classes, :num_classes].astype(jnp.int32)


class ConfusionMatrix:
    """Host-side accumulator (API-compatible with the reference class)."""

    def __init__(self, num_classes: int, ignore_index: Optional[int] = None):
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.virtual_num_classes = num_classes + 1 if ignore_index is not None else num_classes
        self.value = np.zeros((num_classes, num_classes), dtype=np.int64)

    def update(self, pred, true) -> None:
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        true = np.asarray(true).reshape(-1).astype(np.int64)
        if self.ignore_index is not None:
            ignore = true == self.ignore_index
            pred = np.where(ignore, self.virtual_num_classes - 1, pred)
            true = np.where(ignore, self.virtual_num_classes - 1, true)
        mapping = true * self.virtual_num_classes + pred
        bins = np.bincount(mapping, minlength=self.virtual_num_classes ** 2)
        self.value += bins.reshape(self.virtual_num_classes, self.virtual_num_classes)[
            : self.num_classes, : self.num_classes
        ]

    def update_matrix(self, matrix) -> None:
        """Accumulate a precomputed per-batch matrix (from the jitted step)."""
        self.value += np.asarray(matrix, dtype=np.int64)

    def reset(self) -> None:
        self.value = np.zeros((self.num_classes, self.num_classes), dtype=np.int64)

    @property
    def tp(self):
        return np.diag(self.value)

    @property
    def actual(self):
        return self.value.sum(axis=1)

    @property
    def predicted(self):
        return self.value.sum(axis=0)

    @property
    def fn(self):
        return self.actual - self.tp

    @property
    def fp(self):
        return self.predicted - self.tp

    @property
    def count(self):
        return self.value.sum(axis=1)

    @property
    def total(self):
        return self.value.sum()

    @property
    def union(self):
        return self.value.sum(axis=0) + self.value.sum(axis=1) - np.diag(self.value)

    @property
    def overall_accuray(self):  # [sic] reference spelling, metrics.py:137
        total = max(self.total, 1)
        return self.tp.sum() / total

    def all_acc(self):
        return self.cal_acc(self.tp, self.count)

    @staticmethod
    def cal_acc(tp, count):
        acc_per_cls = tp / np.maximum(count, 1) * 100
        overall = tp.sum() / max(count.sum(), 1) * 100
        return float(np.mean(acc_per_cls)), float(overall), acc_per_cls

    def all_metrics(self) -> Tuple[float, float, float, np.ndarray, np.ndarray]:
        tp, fp, fn = self.tp, self.fp, self.fn
        iou_per_cls = tp / np.maximum(tp + fp + fn, 1) * 100
        acc_per_cls = tp / np.maximum(self.count, 1) * 100
        overall = tp.sum() / max(self.total, 1) * 100
        return (
            float(np.mean(iou_per_cls)),
            float(np.mean(acc_per_cls)),
            float(overall),
            iou_per_cls,
            acc_per_cls,
        )


def get_mious(tp, union, count):
    """Reference ``get_mious`` (metrics.py:176-183) on numpy arrays."""
    tp = np.asarray(tp, dtype=np.float64)
    union = np.asarray(union, dtype=np.float64)
    count = np.asarray(count, dtype=np.float64)
    iou_per_cls = (tp + 1e-10) / (union + 1e-10) * 100
    acc_per_cls = (tp + 1e-10) / (count + 1e-10) * 100
    over_all_acc = tp.sum() / max(count.sum(), 1e-10) * 100
    return (
        float(np.mean(iou_per_cls)),
        float(np.mean(acc_per_cls)),
        float(over_all_acc),
        iou_per_cls,
        acc_per_cls,
    )


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)


def PSNR(mse, peak: float = 1.0) -> float:
    """↔ reference ``PSNR`` (utils/metrics.py:8-9)."""
    import math

    return 10 * math.log10((peak ** 2) / mse)


class SegMetric:
    """Comparable miou/oa record (↔ utils/metrics.py:12-30; the reference
    class is dead code that crashes if used — ``better_than`` reads an
    ``acc`` attribute that is never set — so this keeps the intended
    contract: hold the metric dict, compare by mIoU)."""

    def __init__(self, values):
        assert isinstance(values, dict)
        self.miou = values["miou"]
        self.oa = values.get("oa", None)

    def better_than(self, other) -> bool:
        return self.miou > other.miou

    def state_dict(self):
        return {"miou": self.miou, "oa": self.oa}


def IoU_from_confusions(confusions: np.ndarray) -> np.ndarray:
    """Per-class IoU from stacked confusion matrices (↔ utils/metrics.py:
    243-269, the KPConv protocol used by shapenetpart scoring): absent
    classes receive the present-class mean so a later flat mean is the mean
    over present classes only."""
    confusions = np.asarray(confusions, dtype=np.float64)
    tp = np.diagonal(confusions, axis1=-2, axis2=-1)
    tp_fn = confusions.sum(axis=-1)
    tp_fp = confusions.sum(axis=-2)
    iou = tp / (tp_fp + tp_fn - tp + 1e-6)
    absent = tp_fn < 1e-3
    present = np.sum(~absent, axis=-1, keepdims=True)
    miou = iou.sum(axis=-1, keepdims=True) / (present + 1e-6)
    return iou + absent * miou


def _bincount_confusion(gt: np.ndarray, pred: np.ndarray, n: int) -> np.ndarray:
    """Confusion matrix over labels 0..n-1 (rows = gt, cols = pred)."""
    valid = (gt >= 0) & (gt < n) & (pred >= 0) & (pred < n)
    idx = gt[valid].astype(np.int64) * n + pred[valid].astype(np.int64)
    return np.bincount(idx, minlength=n * n).reshape(n, n)


def partnet_metrics(num_classes, num_parts, objects, preds, targets):
    """PartNet part-segmentation scoring (↔ utils/metrics.py:186-240):
    per-shape mIoU over parts 1..P-1 (part 0 = background is forced from
    GT), aggregated per object class (msIoU) and per part (mpIoU)."""
    shape_iou_tot = np.zeros(num_classes)
    shape_iou_cnt = np.zeros(num_classes)
    part_i = [np.zeros(num_parts[c]) for c in range(num_classes)]
    part_u = [np.full(num_parts[c], 1e-6) for c in range(num_classes)]

    for obj, pred, gt in zip(objects, preds, targets):
        obj = int(obj)
        pred = np.argmax(np.asarray(pred)[1:, :], axis=0) + 1
        gt = np.asarray(gt)
        pred = np.where(gt == 0, 0, pred)
        tot, cnt = 0.0, 0
        for j in range(1, num_parts[obj]):
            gt_m, pred_m = gt == j, pred == j
            if gt_m.any() or pred_m.any():
                inter = np.sum(gt_m & pred_m)
                union = np.sum(gt_m | pred_m)
                tot += inter / union
                cnt += 1
                part_i[obj][j] += inter
                part_u[obj][j] += union
        if cnt > 0:
            shape_iou_tot[obj] += tot / cnt
            shape_iou_cnt[obj] += 1

    msIoU = [shape_iou_tot[c] / shape_iou_cnt[c] for c in range(num_classes)]
    mpIoU = [float(np.mean(part_i[c][1:] / part_u[c][1:]))
             for c in range(num_classes)]
    return msIoU, mpIoU, float(np.mean(msIoU)), float(np.mean(mpIoU))


def shapenetpart_metrics(num_classes, num_parts, objects, preds, targets,
                         masks):
    """ShapeNetPart scoring (↔ utils/metrics.py:272-320): per-shape
    confusion over that object's parts, KPConv IoU fill-in for absent
    parts, instance / class averages + overall point accuracy."""
    total_correct = 0.0
    total_seen = 0.0
    confs = []
    for obj, pred, gt, mask in zip(objects, preds, targets, masks):
        obj = int(obj)
        pred = np.argmax(np.asarray(pred), axis=0)[np.asarray(mask)]
        gt = np.asarray(gt)[np.asarray(mask)]
        total_correct += np.sum(pred == gt)
        total_seen += pred.shape[0]
        confs.append(_bincount_confusion(gt, pred, num_parts[obj]))

    objects = np.asarray([int(o) for o in objects])
    obj_mious = []
    for c in range(num_classes):
        idx = np.where(objects == c)[0]
        ious = IoU_from_confusions(np.stack([confs[i] for i in idx]))
        obj_mious.append(np.mean(ious, axis=-1))
    objs_average = [float(np.mean(m)) for m in obj_mious]
    instance_average = float(np.mean(np.hstack(obj_mious)))
    class_average = float(np.mean(objs_average))
    acc = total_correct / total_seen
    return acc, objs_average, class_average, instance_average
