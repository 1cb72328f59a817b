"""Test configuration: pin JAX to CPU with 8 virtual devices.

CI runs the whole suite on the CPU backend (fast, deterministic, and it gives
us an 8-device mesh to exercise the real `shard_map` halo-exchange code paths
without 8 TPU chips — SURVEY.md §6 "distributed tests without a cluster").
Pallas kernels run in interpret mode on CPU (`config.pallas_interpret`).

The dev image's sitecustomize force-registers the `axon` TPU platform before
pytest starts, so plain ``JAX_PLATFORMS=cpu`` is overridden; resetting
``jax_platforms`` after import (before any backend is touched) is the
supported escape hatch. Tests that need real TPU are marked ``tpu`` and skip
on CPU.
"""

import os

import jax
import numpy as np
import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires a real TPU device")
    config.addinivalue_line("markers", "slow: long-running integration test")


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires real TPU")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables + tracing caches after every test module.

    The full suite compiles hundreds of XLA:CPU executables in one
    process; at the observed high-water mark the LLVM-backed compile of
    the structured-sharded solve program segfaulted reproducibly
    (round 5 — in-suite only; the same test passes standalone). Modules
    rarely share compiled programs, and the persistent on-disk cache
    absorbs genuine reuse, so per-module clearing costs little and keeps
    the process far from the crash regime."""
    yield
    jax.clear_caches()
