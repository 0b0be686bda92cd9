"""Test configuration: force an 8-device virtual CPU platform so multi-device
sharding tests run without TPU hardware, and enable x64 for numerical parity
tests against fp64 oracles."""

import os

# Must win over the axon TPU plugin env (JAX_PLATFORMS=axon) that the image's
# sitecustomize sets before conftest runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: F401, E402


def assert_allclose(a, b, rtol=1e-9, atol=1e-9):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


# ---- tiered test runs: `make test` skips @pytest.mark.slow (default pass
# stays fast); `make test-all` / --runslow runs everything -----------------


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (long integration runs)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running integration test (skipped unless --runslow)"
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
