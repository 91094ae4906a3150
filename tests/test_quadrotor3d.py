"""Full 3-D quadrotor (12 states, 4 one-sided thrust inputs): the largest
built-in model family.  Hover equilibrium, waypoint MPC, iLQR hover,
fast-math agreement."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.quadrotor3d import Quadrotor3DEnv

HOVER_STATE = [0.0, 0.0, 1.0] + [0.0] * 9


def build(optimizer, cfg, target=(0.5, -0.3, 1.5)):
    ctrl = MPCController(
        environment_name="quadrotor3d",
        control_limits=(np.zeros(4, np.float32), np.ones(4, np.float32)),
        initial_environment_attributes={
            "target_x": target[0], "target_y": target[1], "target_z": target[2],
        },
        config={"optimizer": optimizer, "controller_logging": False},
    )
    full = {"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 40, "num_rollouts": 512}
    full.update(cfg)
    ctrl.configure(optimizer_name=optimizer, optimizer_config=full)
    return ctrl


def test_hover_thrust_is_equilibrium():
    """Open loop at the analytic hover thrust: the level vehicle stays put."""
    env = Quadrotor3DEnv(batch_size=1, dt=0.02, seed=0)
    env.reset()
    env.state = jnp.array([HOVER_STATE], jnp.float32)
    p = env.params
    hover = p["m"] * p["g"] / (4.0 * p["u_max"])
    u = np.full((1, 4), hover, np.float32)
    for _ in range(100):
        s, *_ = env.step(u)
    np.testing.assert_allclose(np.asarray(s[0]), HOVER_STATE, atol=1e-4)


def test_differential_thrust_signs():
    """Rotor mixing sanity: t2>t4 rolls positive, t3>t1 pitches positive,
    t1+t3>t2+t4 yaws positive (plus-configuration conventions in
    models/dynamics.py)."""
    from control_toolkit_tpu.models.dynamics import (
        QUADROTOR3D_DEFAULTS, quadrotor3d_dynamics,
    )

    x = jnp.zeros((1, 12))
    p = QUADROTOR3D_DEFAULTS
    d_roll = quadrotor3d_dynamics(x, jnp.array([[0.4, 0.5, 0.4, 0.3]]), p)
    assert float(d_roll[0, 9]) > 0  # pD
    d_pitch = quadrotor3d_dynamics(x, jnp.array([[0.3, 0.4, 0.5, 0.4]]), p)
    assert float(d_pitch[0, 10]) > 0  # qD
    d_yaw = quadrotor3d_dynamics(x, jnp.array([[0.5, 0.3, 0.5, 0.3]]), p)
    assert float(d_yaw[0, 11]) > 0  # rD


def test_mppi_waypoint_tracking_3d():
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 5,
        "bounded_update": True,
    })
    env = Quadrotor3DEnv(batch_size=1, dt=0.02, seed=4)
    s, _ = env.reset()
    tail = []
    for t in range(250):
        u = ctrl.step(s[0])
        assert u.min() >= 0.0 and u.max() <= 1.0
        s, *_ = env.step(u)
        if t >= 200:
            tail.append(np.asarray(s[0]))
    # Sampled control hovers with ~0.1-0.2 dispersion; judge the HOVER POINT
    # (mean over the last 50 steps), not one noisy endpoint.
    mean = np.mean(tail, axis=0)
    assert abs(mean[0] - 0.5) < 0.25, f"x missed: mean {mean[:3]}"
    assert abs(mean[1] + 0.3) < 0.25, f"y missed: mean {mean[:3]}"
    assert abs(mean[2] - 1.5) < 0.25, f"z missed: mean {mean[:3]}"
    assert abs(float(s[0, 6])) < 0.4 and abs(float(s[0, 7])) < 0.4, (
        f"excessive tilt: {s[0]}"
    )


@pytest.mark.slow
def test_ilqr_hover_precise():
    ctrl = build("ilqr", {"num_rollouts": 1, "max_iterations": 20, "tol": 1e-7,
                          "regularization_init": 1.0, "regularization_max": 1e8,
                          "line_search_steps": 8}, target=(0.0, 0.0, 1.0))
    env = Quadrotor3DEnv(batch_size=1, dt=0.02, seed=7)
    s, _ = env.reset()
    for _ in range(200):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    pos_err = np.linalg.norm(np.asarray(s[0, :3]) - [0.0, 0.0, 1.0])
    assert pos_err < 0.15, f"ilqr hover missed: {s[0]}"
    assert abs(float(s[0, 6])) < 0.05 and abs(float(s[0, 7])) < 0.05


def test_fast_math_variant_matches_exact():
    """Polynomial-trig dynamics stay within tolerance of exact trig over a
    50-step rollout from a tilted state."""
    from control_toolkit_tpu.models.predictors import PredictorWrapper

    exact, fast = PredictorWrapper(), PredictorWrapper()
    exact.configure(batch_size=8, horizon=50, dt=0.02,
                    predictor_specification="ODE:rk4:1",
                    environment_name="quadrotor3d")
    fast.configure(batch_size=8, horizon=50, dt=0.02,
                   predictor_specification="ODE:rk4:1:fast",
                   environment_name="quadrotor3d")
    rng = np.random.default_rng(0)
    s0 = jnp.asarray(
        np.concatenate([
            rng.normal(0, 0.3, (8, 3)), rng.normal(0, 0.2, (8, 3)),
            rng.normal(0, 0.2, (8, 3)), rng.normal(0, 0.2, (8, 3)),
        ], axis=1), jnp.float32)
    Q = jnp.asarray(rng.uniform(0.2, 0.6, (8, 50, 4)), jnp.float32)
    te = np.asarray(exact.rollout(s0, Q))
    tf_ = np.asarray(fast.rollout(s0, Q))
    np.testing.assert_allclose(tf_, te, atol=5e-3)
