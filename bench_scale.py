"""Scale benchmark: full MPPI step at K = 1M rollouts on one chip.

The driver's bench.py measures the latency target (K=16k); this script
records the throughput story (BASELINE.md scale-out row) across the MPPI
execution modes.  Run manually on TPU:

    python bench_scale.py            # writes BENCH_SCALE.json

One patient process; compiles four programs over the tunnel (~2-4 min).
"""
from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

K = 1 << 20  # 1,048,576 rollouts
H = 50
N = 20
REPS = 2


def measure_step(ctrl):
    import jax
    import jax.numpy as jnp

    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), ctrl._assemble_params()
    )
    s_dev = jnp.zeros((1, 4), jnp.float32)
    step_fn = opt._make_step_fn()

    @jax.jit
    def many(state, s, params):
        def body(st, _):
            u, st2, _ = step_fn(st, s, params)
            return st2, u
        return jax.lax.scan(body, state, None, length=N)

    st, us = many(opt.opt_state, s_dev, params)
    jax.block_until_ready(us)
    t0 = time.perf_counter()
    for _ in range(REPS):
        st, us = many(st, s_dev, params)
        jax.block_until_ready(us)
    return (time.perf_counter() - t0) / (REPS * N) * 1e3


def main():
    import jax

    from __graft_entry__ import _build_mppi

    results = {"K": K, "H": H, "backend": jax.default_backend(), "unit": "ms/step"}

    for name, spec, setup in (
        ("modular", "ODE", {"semi_fused": False}),
        ("semi_fused", "ODE", {}),
        ("semi_fused_fast_math", "ODE:rk4:1:fast", {}),
    ):
        ctrl = _build_mppi(num_rollouts=K, horizon=H, seed=0, predictor_spec=spec)
        for k, v in setup.items():
            setattr(ctrl.optimizer, k, v)
        ms = measure_step(ctrl)
        results[name] = round(ms, 3)
        results[f"{name}_rollouts_per_sec"] = round(K / (ms / 1e3))
        print(f"{name:22s}: {ms:7.3f} ms  ({K / (ms / 1e3) / 1e6:.0f}M rollouts/s)",
              flush=True)

    Path(__file__).parent.joinpath("BENCH_SCALE.json").write_text(
        json.dumps(results, indent=2)
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
