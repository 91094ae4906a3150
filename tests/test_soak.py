"""Cross-feature soak: one long closed loop exercising moving targets,
cost hot-reload, mid-run checkpoint/restore, and a NaN event — the
subsystems must compose without recompiles or state corruption."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.utils import checkpoint


def test_soak_moving_target_reload_checkpoint_nan(tmp_path, monkeypatch):
    # ASF dir with a hot-reloadable cost config
    asf = tmp_path / "asf"
    asf.mkdir()
    cost_yaml = asf / "config_cost_function.yml"
    cost_yaml.write_text(
        "cost_function_name_default: default\n"
        "cartpole:\n  default:\n"
        "    dd_weight: 120.0\n    ep_weight: 10000.0\n    ekp_weight: 10.0\n"
        "    cc_weight: 1.0\n    ccrc_weight: 1.0\n    R: 1.0\n"
    )
    from control_toolkit_tpu.utils.config import set_asf_config_dir
    set_asf_config_dir(str(asf))
    try:
        ctrl = MPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "rpgd-tf", "controller_logging": False},
        )
        ctrl.configure(optimizer_name="rpgd-tf", optimizer_config={
            "seed": 0, "mpc_timestep": 0.02, "mpc_horizon": 30,
            "num_rollouts": 128, "outer_its": 3,
            "SAMPLING_DISTRIBUTION": "uniform",
            "period_interpolation_inducing_points": 4, "learning_rate": 0.05,
            "adam_beta_1": 0.9, "adam_beta_2": 0.999, "adam_epsilon": 1e-8,
            "gradmax_clip": 5, "rtol": 1e-3, "opt_keep_k_ratio": 0.25,
            "resamp_per": 5, "sample_stdev": 0.5, "sample_mean": 0.0,
            "sample_whole_control_space": True, "uniform_dist_min": -1.0,
            "uniform_dist_max": 1.0, "shift_previous": 1, "warmup": False,
            "warmup_iterations": 2,
        })

        env = CartpoleEnv(batch_size=1, dt=0.02, seed=11)
        s, _ = env.reset()

        ckpt = tmp_path / "mid.npz"
        target = 0.0
        for t in range(160):
            if t == 40:
                target = 0.05           # moving setpoint (attr is a jit arg)
            if t == 60:
                # hot-reload a cost weight mid-run
                cost_yaml.write_text(cost_yaml.read_text().replace(
                    "ekp_weight: 10.0", "ekp_weight: 12.0"))
                time.sleep(0.6)         # poll interval is 0.25 s
            if t == 80:
                checkpoint.save_controller(ckpt, ctrl)
            if t == 100:
                # Everything up to here must have kept the pole balanced.
                assert abs(float(s[0, 2])) < 0.4, f"pre-poison diverge: {s[0]}"
                # Poison the optimizer state: the NaN guard must catch it
                # (zero control + auto reset), never emit non-finite u.
                st = ctrl.optimizer.opt_state
                ctrl.optimizer.opt_state = st._replace(
                    Q=jnp.full_like(st.Q, jnp.nan))
            u = ctrl.step(s[0], updated_attributes={"target_position": target})
            assert np.all(np.isfinite(u)), f"non-finite control at t={t}"
            s, *_ = env.step(u)

        # hot-reload actually landed
        assert float(ctrl.cost_function.cost_function.config["ekp_weight"]) == 12.0
        # ...WITHOUT retracing the jitted step: dynamic quantities (targets,
        # reloaded weights) are jit arguments, so exactly one trace exists
        # (CLAUDE.md architecture invariant).
        assert ctrl.optimizer._step_jit._cache_size() == 1
        # Post-poison the warm start was deliberately destroyed; the loop
        # must stay numerically sane regardless of control performance.
        assert np.all(np.isfinite(np.asarray(s)))
        assert np.all(np.isfinite(np.asarray(ctrl.optimizer.opt_state.Q)))
        # ...and the controller is immediately usable from a fresh state.
        u_fresh = ctrl.step(np.zeros(4, np.float32))
        assert np.all(np.isfinite(u_fresh))

        # checkpoint written mid-run restores into a fresh controller
        ctrl2 = MPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "rpgd-tf", "controller_logging": False},
        )
        ctrl2.configure(optimizer_name="rpgd-tf", optimizer_config={
            "seed": 0, "mpc_timestep": 0.02, "mpc_horizon": 30,
            "num_rollouts": 128, "outer_its": 3,
            "SAMPLING_DISTRIBUTION": "uniform",
            "period_interpolation_inducing_points": 4, "learning_rate": 0.05,
            "adam_beta_1": 0.9, "adam_beta_2": 0.999, "adam_epsilon": 1e-8,
            "gradmax_clip": 5, "rtol": 1e-3, "opt_keep_k_ratio": 0.25,
            "resamp_per": 5, "sample_stdev": 0.5, "sample_mean": 0.0,
            "sample_whole_control_space": True, "uniform_dist_min": -1.0,
            "uniform_dist_max": 1.0, "shift_previous": 1, "warmup": False,
            "warmup_iterations": 2,
        })
        checkpoint.load_controller(ckpt, ctrl2)
        np.testing.assert_allclose(
            float(ctrl2.variable_parameters["target_position"]), 0.05, atol=1e-6)
        u2 = ctrl2.step(np.asarray(s[0]))
        assert np.all(np.isfinite(u2))
    finally:
        set_asf_config_dir(None)
