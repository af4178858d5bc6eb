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
