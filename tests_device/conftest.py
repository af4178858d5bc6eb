"""Device-mode kernel tests — run the COMPILED (Mosaic) Pallas kernels on a
real TPU, unlike tests/ which forces JAX_PLATFORMS=cpu and exercises only
interpret mode.  Run via ``tools/run_device_tests.sh`` (or directly:
``python -m pytest tests_device/ -q``); every test is skipped when no TPU
backend is available, so accidental inclusion in CPU CI is harmless.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(reason="no TPU backend available")
    for item in items:
        item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.RandomState(0)
