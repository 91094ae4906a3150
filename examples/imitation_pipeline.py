"""Imitation pipeline demo: MPC expert -> demonstrations -> cloned policy
-> neural-imitator controller, plus learned-dynamics MPC.

    python examples/imitation_pipeline.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas
import tempfile
from pathlib import Path

import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.controllers.neural_imitator import NeuralImitatorController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import (
    collect_mpc_demonstrations,
    collect_transitions,
    fit_mlp_dynamics,
    fit_policy,
)


def main():
    workdir = Path(tempfile.mkdtemp(prefix="ctt_demo_"))
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)

    print("== 1. MPC expert ==")
    expert = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    expert.configure(optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 25, "num_rollouts": 512,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
    })

    print("== 2. collect demonstrations ==")
    states, controls = collect_mpc_demonstrations(expert, env, n_episodes=8,
                                                  episode_len=60, seed=10)
    print(f"   {states.shape[0]} (state, control) pairs")

    print("== 3. behavior-clone a policy ==")
    params, mse = fit_policy(states, controls, hiddens=(32, 32), epochs=3000,
                             learning_rate=2e-3, seed=0)
    print(f"   cloning MSE: {mse:.2e}")
    nets.save_net(workdir / "mlp-32-32.npz", params,
                  meta={"inputs": ["position", "positionD", "angle", "angleD"],
                        "outputs": ["Q"], "arch": {"kind": "mlp", "hiddens": [32, 32]}})

    print("== 4. serve the cloned policy ==")
    imitator = NeuralImitatorController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)), {},
        config={"net_name": "mlp-32-32", "path_to_models": str(workdir),
                "controller_logging": False},
    )
    imitator.configure()
    s, _ = env.reset(seed=99)
    for _ in range(150):
        u = imitator.step(s[0])
        s, *_ = env.step(u)
    print(f"   imitator closed loop: final angle {float(s[0, 2]):+.3f} rad")

    print("== 4b. export the policy to firmware C and run it natively ==")
    from control_toolkit_tpu.controllers.c_controller import CController
    from control_toolkit_tpu.models.export_c import export_npz_policy_c

    cfile = export_npz_policy_c(workdir / "mlp-32-32.npz", workdir / "policy_fw.c")
    native = CController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)), {},
        config={"controller_file": cfile.name, "firmware_path": str(workdir),
                "controller_logging": False},
    )
    native.configure()
    s, _ = env.reset(seed=99)
    for _ in range(150):
        Q = native.step(s[0])
        s, *_ = env.step(Q[0, 0])
    print(f"   exported-C closed loop: final angle {float(s[0, 2]):+.3f} rad "
          f"({cfile.stat().st_size} bytes of C)")

    print("== 5. bonus: learn the dynamics and run MPC on the model ==")
    env16 = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env16, 400, seed=0)
    dyn_params, dmse = fit_mlp_dynamics(x, u, xn, hiddens=(64, 64), epochs=3000,
                                        batch_size=4096, learning_rate=3e-3)
    nets.save_net(workdir / "mlp-64-64.npz", dyn_params, meta={"predict_delta": True})
    mpc_learned = MPCController(
        "cartpole",
        (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        {"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    mpc_learned.configure(
        predictor_specification=f"neural:mlp-64-64:{workdir}",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 5},
    )
    s, _ = env.reset(seed=7)
    for _ in range(100):
        uc = mpc_learned.step(s[0])
        s, *_ = env.step(uc)
    print(f"   MPC on learned dynamics: final angle {float(s[0, 2]):+.3f} rad")


if __name__ == "__main__":
    main()
