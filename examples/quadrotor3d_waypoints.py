"""3-D quadrotor waypoint tour: MPPI flies a 12-state quad through a square
of waypoints by updating target attributes mid-flight (attributes are jit
arguments — retargeting never recompiles).

    python examples/quadrotor3d_waypoints.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas

import numpy as np

from control_toolkit_tpu import import_controller_by_name
from control_toolkit_tpu.environments.quadrotor3d import Quadrotor3DEnv

WAYPOINTS = [(0.0, 0.0, 1.0), (0.8, 0.0, 1.3), (0.8, 0.8, 1.6),
             (0.0, 0.8, 1.3), (0.0, 0.0, 1.0)]
DT = 0.02


def main():
    env = Quadrotor3DEnv(batch_size=1, dt=DT, seed=2)

    Ctrl = import_controller_by_name("mpc")
    ctrl = Ctrl(
        "quadrotor3d",
        control_limits=(np.zeros(4, np.float32), np.ones(4, np.float32)),
        initial_environment_attributes={
            "target_x": 0.0, "target_y": 0.0, "target_z": 1.0,
        },
        config={"optimizer": "mppi", "controller_logging": False,
                "profile_latency": True},
    )
    ctrl.configure(optimizer_config={
        "seed": 5, "mpc_timestep": DT, "mpc_horizon": 40, "num_rollouts": 512,
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 5,
        "bounded_update": True,
    })

    s, _ = env.reset()
    wp_i, hold = 0, 0
    for t in range(3000):
        tx, ty, tz = WAYPOINTS[wp_i]
        u = ctrl.step(s[0], updated_attributes={
            "target_x": tx, "target_y": ty, "target_z": tz,
        })
        s, *_ = env.step(u)
        err = float(np.linalg.norm(np.asarray(s[0, :3]) - [tx, ty, tz]))
        hold = hold + 1 if err < 0.2 else 0
        if hold >= 5:  # settled: next waypoint
            print(f"t={t:4d}  reached waypoint {wp_i}: ({tx:.1f},{ty:.1f},{tz:.1f})"
                  f"  pos={np.round(np.asarray(s[0, :3]), 2)}")
            wp_i, hold = wp_i + 1, 0
            if wp_i == len(WAYPOINTS):
                break
        elif t % 50 == 0:
            print(f"t={t:4d}  -> wp{wp_i}  pos={np.round(np.asarray(s[0, :3]), 2)}"
                  f"  err={err:.2f}")
    else:
        raise SystemExit(f"tour incomplete: reached {wp_i}/{len(WAYPOINTS)}")

    print("\ntour complete.")


if __name__ == "__main__":
    main()
