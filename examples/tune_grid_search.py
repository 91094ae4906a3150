"""On-device hyperparameter grid search (evaluation/tuning.py).

The reference tunes controllers by hand-editing YAML and re-running sims
(its only tooling is the manual cost plotter,
Cost_Functions/cost_function_tester.py:12-61).  Here the whole grid is ONE
device program: every (cost-weight x noise-level) config runs
`episodes_per_config` closed-loop episodes as extra rows of a vmapped
lax.scan, and configs are ranked by realized closed-loop cost — scored
under the BASE cost (score='fixed'), so a config can't win by reshaping
its own objective.

    python examples/tune_grid_search.py [--tpu]
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
from control_toolkit_tpu.evaluation import ClosedLoop, grid_search


def main():
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 25,
        "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.03,
        "period_interpolation_inducing_points": 5,
    })
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.05, noise_seed=11)

    # 3 x 3 grid over a cost weight and a controller-side model constant
    # (pole half-length mismatch vs the fixed plant), 4 Monte-Carlo
    # episodes per config = 36 episodes in ONE launch.
    grid = {
        "cost.ep_weight": np.array([2000.0, 10000.0, 50000.0], np.float32),
        "dyn.L": np.array([0.25, 0.5, 1.0], np.float32),  # plant uses 0.5
    }
    s0 = np.array([0.0, 0.0, 0.35, 0.0], np.float32)  # 20-degree tilt
    t0 = time.perf_counter()
    res = grid_search(loop, grid, s0=s0, ticks=80,
                      episodes_per_config=4, score="fixed")
    dt = time.perf_counter() - t0

    print(f"{len(res['configs'])} configs x 4 episodes x 80 ticks "
          f"in {dt:.2f}s (one device program)")
    print(f"{'ep_weight':>10s} {'dyn.L':>6s} {'mean cost':>10s}")
    for i in res["ranking"]:
        c = res["configs"][i]
        print(f"{c['cost.ep_weight']:10.0f} {c['dyn.L']:6.2f} "
              f"{res['mean_costs'][i]:10.4f}")
    print(f"best: {res['best']} (cost {res['best_cost']:.4f})")


if __name__ == "__main__":
    main()
