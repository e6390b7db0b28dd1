"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests fake a pod with
``--xla_force_host_platform_device_count=8`` (SURVEY.md §4 test plan); the
real-TPU bench path is exercised separately by bench.py / __graft_entry__.py.
Environment must be set before JAX initializes, hence module scope here.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon TPU plugin pins jax_platforms="axon,cpu", overriding the env var —
# force CPU explicitly so tests are hermetic and see the virtual 8-device mesh.
jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need true fp32 matmuls (JAX's default downgrades them)
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: end-to-end tests that dominate suite wall time on this "
        "1-core host. Fast loop: `pytest -m 'not slow' -q` (measured "
        "2026-08-20: ~7.5 min); the full suite remains the CI bar "
        "(measured 14-15 min, needs a dedicated core — never run it "
        "concurrently with another heavy process).",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
