"""MODELS registry + ``build_model_from_cfg`` (↔ openpoints/models/build.py:2-13).

Flax modules are dataclasses, so building from a YAML config is a matter of
filtering the cfg keys down to the module's fields (unknown keys are ignored
with the same tolerance as the reference's ``**kwargs`` constructors).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

from ..utils.registry import Registry

MODELS = Registry("models")


def filter_kwargs(cls, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    fields = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kwargs.items() if k in fields}


def make_module(cls, args, **extra):
    kwargs = dict(args) if args is not None else {}
    kwargs.pop("NAME", None)
    kwargs.update(extra)
    return cls(**filter_kwargs(cls, kwargs))


def build_model_from_cfg(cfg, **kwargs):
    return MODELS.build(cfg, **kwargs)
