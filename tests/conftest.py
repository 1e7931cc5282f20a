"""Test configuration: force an 8-virtual-device CPU backend.

Tests never touch real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (the TPU-native substitute for the reference's missing
distributed tests, SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os
import sys

# MULTIYOLOV5_TPU_TESTS=1 opts into the real device: only the *_tpu test
# modules run (they skip themselves on CPU) and the CPU forcing below is
# bypassed so Pallas kernels execute on hardware.
_REAL_TPU = os.environ.get("MULTIYOLOV5_TPU_TESTS") == "1"
if not _REAL_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: env may point at TPU
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through jax.config too.
import jax  # noqa: E402

if not _REAL_TPU:
    jax.config.update("jax_platforms", "cpu")
    assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
