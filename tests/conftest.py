"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-device sharding tests (pjit/shard_map) run on CPU with
``--xla_force_host_platform_device_count=8`` — the standard way to
exercise multi-chip code paths without a TPU pod.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Note: the TPU platform plugin in this environment force-registers itself
# and ignores the JAX_PLATFORMS env var; the config update is respected.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
