"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
tests run anywhere (the TPU-native analog of a fake distributed backend —
the reference has none, SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The container's sitecustomize force-registers the TPU PJRT plugin in every
# interpreter, overriding JAX_PLATFORMS — pin the platform explicitly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
