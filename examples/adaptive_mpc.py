"""Adaptive MPC: online system identification of a mismatched plant.

The controller's model is a nominal cartpole; the actual plant carries a
heavier, longer pole (a payload change).  An OnlineSysId fits the residual
predictor's MLP correction from the transitions the plant produces while
the controller keeps running — installing new weights is a jit-argument
update, never a recompile.

    python examples/adaptive_mpc.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas

import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu import import_controller_by_name
from control_toolkit_tpu.models.online_sysid import OnlineSysId
from control_toolkit_tpu.models.predictors import ODEPredictor

TRUE_PARAMS = {"m_pole": 0.4, "L": 0.6}  # plant; nominal model differs
DT = 0.02


def run(adapt: bool, steps: int = 300, fit_every: int = 50) -> float:
    Ctrl = import_controller_by_name("mpc")
    ctrl = Ctrl(
        "cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification="ODE+res",
                   optimizer_config={
        "seed": 7, "mpc_timestep": DT, "mpc_horizon": 35, "num_rollouts": 512,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
    })

    plant = ODEPredictor("cartpole", dt=DT, params=TRUE_PARAMS)
    pstep, pp = plant.single_step, plant.default_params()
    sysid = OnlineSysId(ctrl, capacity=1024, batch_size=128,
                        learning_rate=3e-3, seed=1)

    s = np.array([0.0, 0.0, 0.3, 0.0], np.float32)
    cost = 0.0
    for t in range(steps):
        u = np.asarray(ctrl.step(s)).reshape(-1)
        s_next = np.asarray(pstep(jnp.asarray(s[None]), jnp.asarray(u[None]), pp))[0]
        sysid.observe(s, u, s_next)
        s = s_next
        cost += float(20.0 * s[2] ** 2 + 0.5 * s[0] ** 2)
        if adapt and (t + 1) % fit_every == 0:
            diag = sysid.fit_and_apply(steps=300)
            if diag.get("fitted"):
                print(f"  t={t+1}: sysid loss {diag['loss_before']:.2e} -> "
                      f"{diag['loss_after']:.2e} "
                      f"(model mse vs plant: base {sysid.one_step_mse(False):.2e}, "
                      f"adapted {sysid.one_step_mse(True):.2e})")
    return cost / steps


def main():
    print("== nominal model, no adaptation ==")
    c0 = run(adapt=False)
    print(f"mean running cost: {c0:.4f}")
    print("== with online sysid ==")
    c1 = run(adapt=True)
    print(f"mean running cost: {c1:.4f}")
    print(f"adaptation changed mean cost by {100 * (c1 - c0) / c0:+.1f}%")


if __name__ == "__main__":
    main()
