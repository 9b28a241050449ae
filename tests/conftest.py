"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (the strategy
SURVEY.md SS4 prescribes — the reference has no test suite at all).

The environment may pre-register a TPU backend at interpreter startup (via
sitecustomize) and pin JAX_PLATFORMS to it; jax is then already imported by
the time conftest runs, so we clear the backend cache before forcing CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    import jax._src.xla_bridge as _xb

    if _xb.backends_are_initialized():
        _xb._clear_backends()
except Exception:
    pass
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU platform")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
