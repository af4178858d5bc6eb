"""LOSS registry and criteria (↔ openpoints/loss/build.py).

Criteria are parameter-free callables operating on channels-last logits
(B, N, ncls) — the reference's (B, ncls, N) transpose+reshape is a no-op here.

Reference quirks reproduced on purpose:

* ``CrossEntropyAce`` / ``CrossEntropyAcePre`` ignore the configured
  ``label_smoothing`` — they build a plain ``CrossEntropyLoss()``
  (loss/build.py:282-346), whose default ``ignore_index=-100`` is what makes
  the ScanNet path work;
* ``SmoothCrossEntropy`` remaps labels above ``ignore_index`` down by one
  (loss/build.py:27-49).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..utils.registry import Registry
from .contrast import contrast_head

LOSS = Registry("loss")

_TORCH_CE_IGNORE = -100  # torch.nn.CrossEntropyLoss default


def cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                  weight=None, ignore_index: Optional[int] = _TORCH_CE_IGNORE,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """torch.nn.functional.cross_entropy semantics on (..., C) logits.

    Mean over non-ignored elements; with class weights the mean is weighted
    (torch's weighted-mean reduction)."""
    ncls = logits.shape[-1]
    logits = logits.reshape(-1, ncls)
    target = target.reshape(-1)
    valid = jnp.ones_like(target, dtype=logits.dtype)
    if ignore_index is not None:
        valid = (target != ignore_index).astype(logits.dtype)
        target = jnp.where(target == ignore_index, 0, target)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
    if label_smoothing > 0:
        smooth = -jnp.mean(logp, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    if weight is not None:
        w = jnp.asarray(weight)[target] * valid
        return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1.0)


@LOSS.register_module(name=["CrossEntropy", "CrossEntropyLoss"])
class CrossEntropy:
    def __init__(self, label_smoothing: float = 0.0, weight=None,
                 ignore_index: Optional[int] = _TORCH_CE_IGNORE, **kwargs):
        self.label_smoothing = label_smoothing
        self.weight = weight
        self.ignore_index = ignore_index if ignore_index is not None else _TORCH_CE_IGNORE

    def __call__(self, logits, target, *args, **kwargs):
        return cross_entropy(logits, target, weight=self.weight,
                             ignore_index=self.ignore_index,
                             label_smoothing=self.label_smoothing)


@LOSS.register_module()
class SmoothCrossEntropy:
    """↔ loss/build.py:14-66 (label smoothing over n_class − 1 off-targets)."""

    def __init__(self, label_smoothing: float = 0.2,
                 ignore_index: Optional[int] = None,
                 num_classes: Optional[int] = None, weight=None,
                 **kwargs):
        self.label_smoothing = label_smoothing
        self.ignore_index = ignore_index
        self.num_classes = num_classes
        self.weight = None if weight is None else jnp.asarray(weight).reshape(-1)

    def __call__(self, logits, target, *args, **kwargs):
        ncls = logits.shape[-1]
        logits = logits.reshape(-1, ncls)
        target = target.reshape(-1)
        valid = jnp.ones_like(target, dtype=logits.dtype)
        if self.ignore_index is not None:
            valid = (target != self.ignore_index).astype(logits.dtype)
            # remap labels past the ignore_index down by one (build.py:27-49)
            target = jnp.where(target == self.ignore_index, 0, target)
            target = jnp.where(target > self.ignore_index, target - 1, target)
        if self.label_smoothing > 0:
            one_hot = jax.nn.one_hot(target, ncls, dtype=logits.dtype)
            one_hot = one_hot * (1.0 - self.label_smoothing) + \
                (1.0 - one_hot) * self.label_smoothing / (ncls - 1)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if self.weight is not None:
                per = -jnp.sum(one_hot * logp * self.weight, axis=-1)
            else:
                per = -jnp.sum(one_hot * logp, axis=-1)
            return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
        return cross_entropy(logits, target, weight=self.weight,
                             ignore_index=None)


@LOSS.register_module()
class MaskedCrossEntropy:
    """↔ loss/build.py:69-81."""

    def __init__(self, label_smoothing: float = 0.2, **kwargs):
        self.label_smoothing = label_smoothing

    def __call__(self, logits, target, mask):
        ncls = logits.shape[-1]
        logits = logits.reshape(-1, ncls)
        target = target.reshape(-1)
        m = mask.reshape(-1).astype(logits.dtype)
        logp = jax.nn.log_softmax(logits, axis=-1)
        one_hot = jax.nn.one_hot(target, ncls, dtype=logits.dtype)
        one_hot = one_hot * (1.0 - self.label_smoothing) + \
            (1.0 - one_hot) * self.label_smoothing / max(ncls - 1, 1)
        per = -jnp.sum(one_hot * logp, axis=-1)
        return jnp.sum(per * m) / jnp.maximum(jnp.sum(m), 1.0)


@LOSS.register_module()
class BCELogits:
    """↔ loss/build.py:83-95."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, logits, target, *args, **kwargs):
        ncls = logits.shape[-1]
        logits = logits.reshape(-1, ncls)
        onehot = jax.nn.one_hot(target.reshape(-1), ncls, dtype=logits.dtype)
        per = jnp.maximum(logits, 0) - logits * onehot + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        return jnp.mean(per)


@LOSS.register_module()
class FocalLoss:
    """↔ loss/build.py:97-129."""

    def __init__(self, gamma: float = 0, alpha=None, size_average: bool = True,
                 **kwargs):
        self.gamma = gamma
        if isinstance(alpha, (float, int)):
            alpha = [alpha, 1 - alpha]
        self.alpha = None if alpha is None else jnp.asarray(alpha)
        self.size_average = size_average

    def __call__(self, logits, target, *args, **kwargs):
        ncls = logits.shape[-1]
        logits = logits.reshape(-1, ncls)
        target = target.reshape(-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        logpt = jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
        pt = jnp.exp(jax.lax.stop_gradient(logpt))
        if self.alpha is not None:
            logpt = logpt * self.alpha[target]
        loss = -((1.0 - pt) ** self.gamma) * logpt
        return jnp.mean(loss) if self.size_average else jnp.sum(loss)


@LOSS.register_module()
class Poly1CrossEntropyLoss:
    """↔ loss/build.py:134-178."""

    def __init__(self, num_classes: int = 50, epsilon: float = 1.0,
                 reduction: str = "mean", weight=None, **kwargs):
        self.num_classes = num_classes
        self.epsilon = epsilon
        self.reduction = reduction
        self.weight = weight

    def __call__(self, logits, target, *args, **kwargs):
        ncls = logits.shape[-1]
        logits = logits.reshape(-1, ncls)
        target = target.reshape(-1)
        onehot = jax.nn.one_hot(target, self.num_classes, dtype=logits.dtype)
        pt = jnp.sum(onehot * jax.nn.softmax(logits, axis=-1), axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, target[:, None], axis=-1)[:, 0]
        if self.weight is not None:
            ce = ce * jnp.asarray(self.weight)[target]
        poly1 = ce + self.epsilon * (1.0 - pt)
        if self.reduction == "mean":
            return jnp.mean(poly1)
        if self.reduction == "sum":
            return jnp.sum(poly1)
        return poly1


@LOSS.register_module()
class Poly1FocalLoss:
    """↔ loss/build.py:181-257."""

    def __init__(self, epsilon: float = 1.0, alpha: float = 0.25,
                 gamma: float = 2.0, reduction: str = "mean",
                 label_is_onehot: bool = False, **kwargs):
        self.epsilon = epsilon
        self.alpha = alpha
        self.gamma = gamma
        self.reduction = reduction
        self.label_is_onehot = label_is_onehot

    def __call__(self, logits, target, *args, **kwargs):
        ncls = logits.shape[-1]
        p = jax.nn.sigmoid(logits)
        if not self.label_is_onehot:
            labels = jax.nn.one_hot(target, ncls, dtype=logits.dtype)
        else:
            labels = target.astype(logits.dtype)
        ce = jnp.maximum(logits, 0) - logits * labels + \
            jnp.log1p(jnp.exp(-jnp.abs(logits)))
        pt = labels * p + (1.0 - labels) * (1.0 - p)
        fl = ce * ((1.0 - pt) ** self.gamma)
        if self.alpha >= 0:
            alpha_t = self.alpha * labels + (1.0 - self.alpha) * (1.0 - labels)
            fl = alpha_t * fl
        poly1 = fl + self.epsilon * (1.0 - pt) ** (self.gamma + 1)
        if self.reduction == "mean":
            return jnp.mean(poly1)
        if self.reduction == "sum":
            return jnp.sum(poly1)
        return poly1


@LOSS.register_module()
class MultiShapeCrossEntropy:
    """↔ loss/build.py:259-274 (part segmentation)."""

    def __init__(self, criterion_args=None, **kwargs):
        self.criterion = build_criterion_from_cfg(criterion_args or {"NAME": "CrossEntropy"})

    def __call__(self, logits_all_shapes, points_labels, shape_labels):
        losses = 0.0
        batch = shape_labels.shape[0]
        for i in range(batch):
            sl = int(shape_labels[i])
            losses = losses + self.criterion(logits_all_shapes[sl][i][None],
                                             points_labels[i][None])
        return losses / batch


def MAPE(output, target):
    return jnp.mean(jnp.abs((output - target) / (target + 1e-12)))


@LOSS.register_module()
class CrossEntropyAce:
    """AMContrast3D objective: w1·CE + w2·AdaptiveMarginContrast
    (↔ loss/build.py:325-346)."""

    def __init__(self, **kwargs):
        self.ce = CrossEntropy()  # plain CE, smoothing deliberately ignored

    def __call__(self, logits, target, up_stages, num_classes: int,
                 ignore_index: Optional[int], ambiguity_args: Dict):
        ce = self.ce(logits, target)
        contrast, target_ai_list = contrast_head(
            up_stages, target, num_classes, ignore_index, ambiguity_args)
        w1, w2 = ambiguity_args["w1"], ambiguity_args["w2"]
        return w1 * ce + w2 * contrast


@LOSS.register_module()
class CrossEntropyAcePre:
    """AMContrast3D++ objective: Seg = w1·CE + w2·Contrast,
    Reg = w3·MAE(pred ai, target ai) (↔ loss/build.py:282-319)."""

    def __init__(self, **kwargs):
        self.ce = CrossEntropy()

    def __call__(self, logits, target, up_stages, pred_ai_list,
                 num_classes: int, ignore_index: Optional[int],
                 ambiguity_args: Dict):
        ce = self.ce(logits, target)
        contrast, target_ai_list = contrast_head(
            up_stages, target, num_classes, ignore_index, ambiguity_args)
        pred = jnp.concatenate([a.reshape(-1) for a in pred_ai_list])
        tgt = jnp.concatenate([a.reshape(-1) for a in target_ai_list])
        reg = jnp.mean(jnp.abs(pred - jax.lax.stop_gradient(tgt)))  # MAE / L1
        w1, w2, w3 = (ambiguity_args["w1"], ambiguity_args["w2"],
                      ambiguity_args["w3"])
        ce, contrast, reg = w1 * ce, w2 * contrast, w3 * reg
        return ce + contrast, ce, contrast, reg


def build_criterion_from_cfg(cfg, **kwargs):
    return LOSS.build(cfg, **kwargs)
