"""Test configuration.

Forces JAX onto an 8-virtual-device CPU platform so multi-chip sharding tests
run anywhere (the driver separately dry-runs the multichip path; real-TPU
benchmarking happens via bench.py).  Must run before jax is imported.
"""

import os

# the environment presets JAX_PLATFORMS=axon (the real TPU tunnel); tests
# must run hermetically on CPU, so force-override rather than setdefault —
# and clear the axon relay pool so child processes never dial the TPU.
# Set EMOTTS_TEST_DEVICE=1 to instead run the suite on the real device
# (e.g. the on-device mel-parity gate: EMOTTS_TEST_DEVICE=1 pytest
# tests/test_audio_mel.py) — multi-device sharding tests then skip.
_ON_DEVICE = os.environ.get("EMOTTS_TEST_DEVICE") == "1"
if not _ON_DEVICE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# sitecustomize may have already imported jax and registered the axon PJRT
# plugin at interpreter startup (before this file runs), in which case the
# env var above is too late for THIS process — but the platform choice is
# still unresolved until first backend use, and the config knob wins.
import jax  # noqa: E402

if not _ON_DEVICE:
    jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "multichip: needs the 8-virtual-device CPU mesh"
    )


def pytest_collection_modifyitems(config, items):
    if _ON_DEVICE and len(jax.devices()) < 8:
        import pytest as _pytest

        skip = _pytest.mark.skip(reason="needs 8 devices (CPU-mesh-only test)")
        for item in items:
            if "multichip" in item.keywords:
                item.add_marker(skip)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
