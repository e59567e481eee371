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

# Persistent compilation cache: the suite's dominant cost on this single
# CPU core is XLA compiles (the FlowNet train-step compile alone runs for
# minutes); caching them makes repeat suite runs several times faster.
_cache_dir = os.environ.get(
    "VEC_VAD_TPU_TEST_CACHE", "/tmp/vec_vad_tpu_xla_cache"
)
if _cache_dir:  # set VEC_VAD_TPU_TEST_CACHE="" to disable
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
