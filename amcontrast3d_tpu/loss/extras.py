"""Remaining loss parity items.

↔ ``openpoints/loss/cross_entropy.py`` (LabelSmoothingCrossEntropy :13,
SoftTargetCrossEntropy :31) and ``openpoints/loss/distill_loss.py``
(DistillLoss :14 — unused by the segmentation path but part of the loss
registry surface).  Chamfer/EMD criteria wrap the device ops so they are
buildable from configs like any other loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import chamfer_distance_l1, chamfer_distance_l2, earth_mover_distance
from .build import LOSS


@LOSS.register_module()
class LabelSmoothingCrossEntropy:
    """↔ cross_entropy.py:13-28 (timm)."""

    def __init__(self, smoothing: float = 0.1, **kwargs):
        assert smoothing < 1.0
        self.smoothing = smoothing

    def __call__(self, x, target, *args, **kwargs):
        ncls = x.shape[-1]
        x = x.reshape(-1, ncls)
        target = target.reshape(-1)
        logprobs = jax.nn.log_softmax(x, axis=-1)
        nll = -jnp.take_along_axis(logprobs, target[:, None], axis=-1)[:, 0]
        smooth = -jnp.mean(logprobs, axis=-1)
        return jnp.mean((1.0 - self.smoothing) * nll + self.smoothing * smooth)


@LOSS.register_module()
class SoftTargetCrossEntropy:
    """↔ cross_entropy.py:31-39: target is a probability distribution."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, x, target, *args, **kwargs):
        loss = jnp.sum(-target * jax.nn.log_softmax(x, axis=-1), axis=-1)
        return jnp.mean(loss)


@LOSS.register_module()
class DistillLoss:
    """↔ distill_loss.py:14: CE on labels + KL to a teacher distribution."""

    def __init__(self, temperature: float = 1.0, alpha: float = 0.5, **kwargs):
        self.temperature = temperature
        self.alpha = alpha

    def __call__(self, student_logits, target, teacher_logits):
        from .build import cross_entropy
        ce = cross_entropy(student_logits, target)
        t = self.temperature
        p_t = jax.nn.softmax(teacher_logits / t, axis=-1)
        log_p_s = jax.nn.log_softmax(student_logits / t, axis=-1)
        kl = jnp.mean(jnp.sum(
            p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - log_p_s), axis=-1)) * t * t
        return (1 - self.alpha) * ce + self.alpha * kl


@LOSS.register_module()
class ChamferDistanceL2:
    """↔ cpp/chamfer_dist/__init__.py ChamferDistanceL2."""

    def __init__(self, ignore_zeros: bool = False, **kwargs):
        self.ignore_zeros = ignore_zeros

    def __call__(self, xyz1, xyz2, *args, **kwargs):
        return chamfer_distance_l2(xyz1, xyz2, self.ignore_zeros)


@LOSS.register_module()
class ChamferDistanceL1:
    """↔ cpp/chamfer_dist/__init__.py ChamferDistanceL1."""

    def __init__(self, ignore_zeros: bool = False, **kwargs):
        self.ignore_zeros = ignore_zeros

    def __call__(self, xyz1, xyz2, *args, **kwargs):
        return chamfer_distance_l1(xyz1, xyz2, self.ignore_zeros)


@LOSS.register_module()
class EarthMoverDistance:
    """↔ cpp/emd/emd.py earth_mover_distance module."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, xyz1, xyz2, *args, **kwargs):
        return earth_mover_distance(xyz1, xyz2)
