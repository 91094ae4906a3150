"""PETS on cartpole: iterate (fit ensemble -> plan -> collect) like the
real algorithm (Chua et al., NeurIPS 2018).

The reference toolkit always plans over ONE externally-trained net; this
demo runs the full model-based-RL loop in-repo:

1. collect random-policy transitions from the true cartpole,
2. fit a bootstrap ensemble of E dynamics MLPs (one member-vmapped Adam
   step trains all members; models/training.py),
3. plan with MPPI under TS-inf trajectory sampling over the LEARNED
   ensemble on the real plant, recording the on-policy transitions,
4. aggregate the data, re-fit, hot-swap the stacked weights (params are
   jit arguments — zero recompiles), and repeat.

Between rounds it prints the ensemble's epistemic disagreement on the
on-policy state distribution — watch it shrink as the data improves.

    python examples/pets_cartpole.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas

import numpy as np

from control_toolkit_tpu import import_controller_by_name
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.ensemble_predictor import EnsemblePredictor
from control_toolkit_tpu.models.training import (
    collect_transitions,
    fit_ensemble_mlp_dynamics,
)

DT = 0.02
E = 4
ROUNDS = 3


def main() -> None:
    env = CartpoleEnv(batch_size=16, dt=DT, seed=0)
    x, u, xn = collect_transitions(env, 300, seed=0)

    Ctrl = import_controller_by_name("mpc")
    ctrl = Ctrl(
        "cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )

    params, mses = fit_ensemble_mlp_dynamics(
        x, u, xn, n_members=E, hiddens=(32, 32), epochs=2000, seed=0
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"ensemble:mlp-32-32:{E}",
        predictor_config={"params": params},
        optimizer_config={
            "seed": 1, "mpc_timestep": DT, "mpc_horizon": 25,
            "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5,
        },
    )
    ens: EnsemblePredictor = ctrl.predictor.predictor

    def episode(ticks: int = 60):
        plant = CartpoleEnv(batch_size=1, dt=DT, seed=5)
        s, _ = plant.reset()
        ctrl.controller_reset()
        xs, us, xns, cost = [], [], [], 0.0
        for _ in range(ticks):
            uu = np.asarray(ctrl.step(s[0])).reshape(-1)
            s_next, *_ = plant.step(uu)
            xs.append(s[0].copy()); us.append(uu.copy()); xns.append(s_next[0].copy())
            s = s_next
            cost += float(20.0 * s[0, 2] ** 2 + 0.5 * s[0, 0] ** 2)
        return np.stack(xs), np.stack(us), np.stack(xns), cost, abs(float(s[0, 2]))

    probe = None
    for r in range(ROUNDS):
        if r > 0:
            t0 = time.perf_counter()
            params, mses = fit_ensemble_mlp_dynamics(
                x, u, xn, n_members=E, hiddens=(32, 32), epochs=2000, seed=0
            )
            # Hot-swap the stacked weights: shapes unchanged -> the jitted
            # optimizer step takes them as arguments, zero recompiles.
            ens.net_params = params
            print(f"  re-fit on {len(x)} transitions "
                  f"({time.perf_counter() - t0:.1f}s, member MSE "
                  f"{mses.min():.1e}..{mses.max():.1e})")
        xs, us, xns, cost, ang = episode()
        if probe is None:
            # Fixed probe: the round-0 on-policy states + applied plans.
            probe = (xs[:32], np.repeat(us[:32, None, :], 10, axis=1))
        dis = float(np.mean(np.asarray(ens.disagreement(*probe))))
        print(f"round {r}: realized cost {cost:7.1f}  final |angle| {ang:.3f} rad  "
              f"ensemble disagreement {dis:.4f}")
        x = np.concatenate([x, xs]); u = np.concatenate([u, us])
        xn = np.concatenate([xn, xns])
        assert ang < 0.35, f"PETS round {r} failed to stabilize"

    print("PETS OK")


if __name__ == "__main__":
    main()
