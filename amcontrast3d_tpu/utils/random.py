"""Reproducibility helpers (reference ``openpoints/utils/random.py:6-15``).

On TPU, determinism comes for free from XLA + explicit ``jax.random`` keys;
this seeds the host-side numpy/python RNGs used by the data pipeline and
returns a root ``jax.random.PRNGKey``.
"""
from __future__ import annotations

import random as _py_random

import jax
import numpy as np


def set_random_seed(seed: int = 0, deterministic: bool = False):
    _py_random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)
