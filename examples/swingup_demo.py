"""Closed-loop swing-up demos: MPPI on pendulum, cartpole, acrobot.

    python examples/swingup_demo.py [pendulum|cartpole|acrobot]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas
import sys

import numpy as np

from control_toolkit_tpu import import_controller_by_name
from control_toolkit_tpu.utils.registry import environments, _load_builtins

CONFIGS = {
    "pendulum": dict(mpc_horizon=50, num_rollouts=512, SQRTRHOINV=0.2, LBD=5.0,
                     period_interpolation_inducing_points=5, dt=0.02, steps=200),
    "cartpole": dict(mpc_horizon=35, num_rollouts=1024, SQRTRHOINV=0.05, LBD=100.0,
                     period_interpolation_inducing_points=5, dt=0.02, steps=200),
    "acrobot": dict(mpc_horizon=40, num_rollouts=700, SQRTRHOINV=0.6, LBD=20.0,
                    period_interpolation_inducing_points=4, dt=0.05, steps=150,
                    cc_weight=0.0),
}


def main(env_name: str = "pendulum"):
    cfg = CONFIGS[env_name]
    _load_builtins()
    EnvCls = environments.get(env_name)
    env = EnvCls(batch_size=1, dt=cfg["dt"], seed=2)

    Ctrl = import_controller_by_name("mpc")
    ctrl = Ctrl(
        env_name,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0}
        if env_name == "cartpole" else {},
        config={"optimizer": "mppi", "controller_logging": False,
                "profile_latency": True},
    )
    ctrl.configure(optimizer_config={
        "seed": 5, "mpc_timestep": cfg["dt"], "mpc_horizon": cfg["mpc_horizon"],
        "num_rollouts": cfg["num_rollouts"], "cc_weight": cfg.get("cc_weight", 1.0),
        "R": 1.0, "LBD": cfg["LBD"], "NU": 1000.0, "SQRTRHOINV": cfg["SQRTRHOINV"],
        "period_interpolation_inducing_points": cfg["period_interpolation_inducing_points"],
    })

    s, _ = env.reset()
    reward_total = 0.0
    for t in range(cfg["steps"]):
        u = ctrl.step(s[0])
        s, r, *_ = env.step(u)
        reward_total += float(np.asarray(r).sum())
        if t % 20 == 0:
            print(f"t={t:4d}  state={np.round(np.asarray(s[0]), 3)}  u={float(u[0]):+.2f}")
    print(f"\ntotal reward: {reward_total:.1f}")
    ctrl.controller_report()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "pendulum")
