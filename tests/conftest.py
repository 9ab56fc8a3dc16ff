"""Test configuration.

Forces JAX onto an 8-virtual-device CPU platform so multi-chip sharding tests
run anywhere (the driver separately dry-runs the multichip path; real-TPU
benchmarking happens via bench.py).  Must run before jax is imported.
"""

import os

# the environment presets JAX_PLATFORMS=axon (the real TPU tunnel); tests
# must run hermetically on CPU, so force-override rather than setdefault
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
