"""Test harness: force an 8-device virtual CPU mesh before JAX import.

Tests run entirely on CPU (JAX_PLATFORMS=cpu) with 8 virtual devices so all
sharding/pjit paths exercise a real multi-device mesh without TPU hardware.
bench.py / production entry points do NOT import this and run on the real
chip.
"""

import os

# Overwrite unconditionally: the shell presets JAX_PLATFORMS=axon (TPU).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize.py imports jax at interpreter start (to register
# the axon TPU plugin), so jax cached JAX_PLATFORMS=axon before this file
# ran — the env var alone is too late. Force the config directly.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
