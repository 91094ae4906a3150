"""Persistent XLA compilation cache (utils/compile_cache.py).

Serving restarts must reload compiled controller programs from disk
instead of re-paying the XLA compile (2-250 s per program through the TPU
tunnel).  Exercised across real process boundaries: the first process
populates the cache, the second must hit it (no new entries) and produce
the same control.
"""
import json
import subprocess
import sys

import numpy as np
import pytest

from control_toolkit_tpu.utils.compile_cache import (
    cache_entry_count,
    enable_persistent_cache,
)

CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from control_toolkit_tpu.utils.compile_cache import (
    cache_entry_count, enable_persistent_cache)
enable_persistent_cache({cache!r}, min_compile_time_secs=0.0)
import numpy as np
from control_toolkit_tpu.controllers.mpc import MPCController
ctrl = MPCController(
    "cartpole",
    (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
    {{"target_position": 0.0}},
    config={{"optimizer": "mppi", "controller_logging": False}},
)
ctrl.configure(optimizer_name="mppi", optimizer_config={{
    "seed": 2, "mpc_timestep": 0.02, "mpc_horizon": 10, "num_rollouts": 32,
    "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
    "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5}})
u = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
print(json.dumps({{"u": float(np.asarray(u).reshape(-1)[0]),
                   "entries": cache_entry_count({cache!r})}}))
"""


def _run_child(repo, cache):
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=repo, cache=cache)],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow  # two fresh python processes, full jax import + compile each
def test_cache_populates_then_hits(tmp_path):
    import pathlib

    import control_toolkit_tpu

    repo = str(pathlib.Path(control_toolkit_tpu.__file__).parents[1])
    cache = str(tmp_path / "xla-cache")
    first = _run_child(repo, cache)
    assert first["entries"] > 0, "first process must populate the cache"
    second = _run_child(repo, cache)
    # Identical program + flags -> pure cache hits: no new entries, and the
    # deserialized executable computes the same control.
    assert second["entries"] == first["entries"]
    np.testing.assert_allclose(second["u"], first["u"], rtol=0, atol=0)


def test_enable_returns_and_creates_dir(tmp_path):
    import jax

    try:
        d = enable_persistent_cache(str(tmp_path / "cc"))
        assert (tmp_path / "cc").is_dir()
        assert cache_entry_count(d) == 0
    finally:
        # tmp_path is torn down after the test: unhook the global cache so
        # later suite compiles don't write into a deleted directory.
        jax.config.update("jax_compilation_cache_dir", None)
