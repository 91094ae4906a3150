"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use XLA's host
platform device-count override (SURVEY §4 test strategy).

Note: this environment force-registers a TPU plugin via sitecustomize and
presets JAX_PLATFORMS, so the env-var route is not enough — we must also set
the jax_platforms config before any backend is touched.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

# The suite is compile-bound (wall time tracks single-core XLA compile
# throughput), so persist compiles across runs: a warm rerun skips most
# of the compile cost.  Repo-local dir so CI workspaces keep it between
# attempts; harmless when cold.  Tests that count recompiles inspect the
# jit TRACE cache (fn._cache_size()), which this does not touch.
from control_toolkit_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache(
    os.path.join(os.path.dirname(__file__), "..", ".xla_test_cache")
)

assert jax.default_backend() == "cpu", "tests must not grab the real TPU"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"


def pytest_collection_modifyitems(config, items):
    """Skip the slow tier unless the user passed an explicit -m expression.

    A skip marker (rather than addopts deselection) keeps directly-targeted
    slow files/node-ids collectable: they report as skipped with a reason
    instead of 'no tests ran' + exit code 5."""
    if config.option.markexpr:
        return
    skip = pytest.mark.skip(reason="slow tier: run with -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
