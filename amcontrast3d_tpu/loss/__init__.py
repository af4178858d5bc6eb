from .build import (LOSS, CrossEntropy, CrossEntropyAce, CrossEntropyAcePre,
                    MaskedCrossEntropy, SmoothCrossEntropy,
                    build_criterion_from_cfg, cross_entropy)
from .contrast import (ambiguity_head, contrast_head, contrast_softnn,
                       contrast_softnn_margin, dist_cos, dist_dot, dist_kl,
                       dist_l2, point_contrast_margin)
from . import extras  # noqa: F401  (registers extra losses)
from .aef import one_hot_labels, stage_ambiguity, stage_neighborhood, subscene_labels

__all__ = [
    "LOSS", "CrossEntropy", "CrossEntropyAce", "CrossEntropyAcePre",
    "MaskedCrossEntropy", "SmoothCrossEntropy", "build_criterion_from_cfg",
    "cross_entropy", "ambiguity_head", "contrast_head", "contrast_softnn",
    "contrast_softnn_margin", "dist_cos", "dist_dot", "dist_kl", "dist_l2",
    "point_contrast_margin", "one_hot_labels", "stage_ambiguity",
    "stage_neighborhood", "subscene_labels",
]
