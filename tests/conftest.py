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

# Persistent XLA compilation cache: compiles dominate the suite cost on
# this 1-core host, and most tests recompile the same graphs run after
# run. A warm cache cuts the fast tier severalfold, which is what makes
# "run the suite before every snapshot" actually happen (two r3/r4
# regressions shipped solely because the suite was too expensive to
# run). The cache key includes jaxlib + XLA flags, so entries stay
# correct across code edits; stale entries are simply never hit.
# Override the location with TEMPO_TPU_TEST_CACHE=; disable with
# TEMPO_TPU_TEST_CACHE=0.
_cache = os.environ.get("TEMPO_TPU_TEST_CACHE",
                        "/tmp/tempo_tpu_test_xla_cache")
if _cache != "0":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the CPU platform")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
