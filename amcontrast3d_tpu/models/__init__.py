from .build import MODELS, build_model_from_cfg, make_module
from .layers import ConvBlock, MLPBlocks, create_act
from .pointnext import (FeaturePropagation, InvResMLP, LocalAggregation,
                        PointNextDecoder, PointNextEncoder, ResBlock,
                        SegHead, SetAbstraction)
from . import apm  # noqa: F401  (registers APM modules)
from . import pointnet, pointnetv2, pointvit, part_seg  # noqa: F401
from . import group_embed  # noqa: F401  (registers PointPatchEmbed/P3Embed)
from .base_seg import BaseSeg, BaseSeg_AMContrast3D, BaseSeg_M_AMContrast3D
from .refine import dual_masks, map_multiply, map_sum, multiply

__all__ = [
    "MODELS", "build_model_from_cfg", "make_module",
    "ConvBlock", "MLPBlocks", "create_act",
    "FeaturePropagation", "InvResMLP", "LocalAggregation",
    "PointNextDecoder", "PointNextEncoder", "ResBlock", "SegHead",
    "SetAbstraction", "BaseSeg", "BaseSeg_AMContrast3D",
    "BaseSeg_M_AMContrast3D", "dual_masks", "map_multiply", "map_sum",
    "multiply",
]
