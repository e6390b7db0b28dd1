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


@pytest.fixture
def rng():
    return np.random.default_rng(0)
