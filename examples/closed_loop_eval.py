"""On-device closed-loop evaluation demo (evaluation/ClosedLoop).

Runs the whole controller+plant episode as ONE jitted program — compare
against the eager per-tick loop the reference uses (README.md:199-204
style).  On a TPU behind a dispatch boundary the eager loop pays the full
host round-trip EVERY tick; the fused loop pays it once per episode.

    python examples/closed_loop_eval.py [pendulum|cartpole]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

if __name__ == "__main__" and "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.environments.pendulum import PendulumEnv
from control_toolkit_tpu.evaluation import ClosedLoop


def build(env_name: str):
    ctrl = MPCController(
        environment_name=env_name,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes=(
            {"target_position": 0.0} if env_name == "cartpole" else {}
        ),
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 25,
        "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.03,
        "period_interpolation_inducing_points": 5,
    })
    env = (CartpoleEnv if env_name == "cartpole" else PendulumEnv)(
        batch_size=1, dt=0.02, seed=3
    )
    return ctrl, env


def main():
    env_name = next((a for a in sys.argv[1:] if not a.startswith("-")), "cartpole")
    T = 150
    ctrl, env = build(env_name)
    s0, _ = env.reset()

    # Fused on-device loop: one launch for the whole episode.  (ticks is a
    # static arg — warm with the SAME length so the timed run is dispatch
    # + device time only.)
    loop = ClosedLoop(ctrl, env)
    loop.run(s0[0], ticks=T)  # compile
    t0 = time.perf_counter()
    out = loop.run(s0[0], ticks=T)
    fused_s = time.perf_counter() - t0

    # Eager reference loop: controller.step + env.step per tick.
    ctrl2, env2 = build(env_name)
    s, _ = env2.reset(seed=3)
    ctrl2.step(s[0])  # compile
    t0 = time.perf_counter()
    for _ in range(T):
        u = ctrl2.step(s[0])
        s, *_ = env2.step(u)
    eager_s = time.perf_counter() - t0

    print(f"{env_name}: {T} ticks")
    print(f"  fused one-program episode : {fused_s*1e3:8.1f} ms "
          f"({fused_s/T*1e3:.3f} ms/tick)  mean stage cost {out['mean_cost']:.3f}")
    print(f"  eager per-tick loop       : {eager_s*1e3:8.1f} ms "
          f"({eager_s/T*1e3:.3f} ms/tick)")
    print(f"  final state: {out['final_state']}")


if __name__ == "__main__":
    main()
