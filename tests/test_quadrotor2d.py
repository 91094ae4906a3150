"""Planar quadrotor (6 states, 2 one-sided thrust inputs): waypoint MPC,
iLQR hover, energy sanity."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.quadrotor2d import Quadrotor2DEnv


def build(optimizer, cfg, target=(0.5, 1.5)):
    ctrl = MPCController(
        environment_name="quadrotor2d",
        control_limits=(np.array([0.0, 0.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"target_x": target[0], "target_z": target[1]},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    full = {"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 40, "num_rollouts": 512}
    full.update(cfg)
    ctrl.configure(optimizer_name=optimizer, optimizer_config=full)
    return ctrl


def test_hover_thrust_is_equilibrium():
    """Open loop at the analytic hover thrust: the level vehicle stays put."""
    env = Quadrotor2DEnv(batch_size=1, dt=0.02, seed=0)
    env.reset()
    env.state = jnp.array([[0.0, 1.0, 0.0, 0.0, 0.0, 0.0]], jnp.float32)
    p = env.params
    hover = p["m"] * p["g"] / (2.0 * p["u_max"])
    u = np.array([[hover, hover]], np.float32)
    for _ in range(100):
        s, *_ = env.step(u)
    np.testing.assert_allclose(np.asarray(s[0]),
                               [0.0, 1.0, 0.0, 0.0, 0.0, 0.0], atol=1e-4)


def test_mppi_waypoint_tracking():
    """Bounded-update MPPI flies to a waypoint with one-sided thrust
    bounds (the raw-delta reference rule drifts upward here — the floor is
    only 0.33 away while the ceiling is 0.67)."""
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 5,
        "bounded_update": True,
    })
    env = Quadrotor2DEnv(batch_size=1, dt=0.02, seed=4)
    s, _ = env.reset()
    for _ in range(250):
        u = ctrl.step(s[0])
        assert u.min() >= 0.0 and u.max() <= 1.0
        s, *_ = env.step(u)
    assert abs(float(s[0, 0]) - 0.5) < 0.2, f"x missed: {s[0]}"
    assert abs(float(s[0, 1]) - 1.5) < 0.25, f"z missed: {s[0]}"
    assert abs(float(s[0, 4])) < 0.4, f"excessive tilt: {s[0]}"


@pytest.mark.slow
def test_ilqr_hover_precise():
    ctrl = build("ilqr", {"num_rollouts": 1, "max_iterations": 20, "tol": 1e-7,
                          "regularization_init": 1.0, "regularization_max": 1e8,
                          "line_search_steps": 8}, target=(0.0, 1.0))
    env = Quadrotor2DEnv(batch_size=1, dt=0.02, seed=7)
    s, _ = env.reset()
    for _ in range(200):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 0])) < 0.1 and abs(float(s[0, 1]) - 1.0) < 0.1, (
        f"ilqr hover missed: {s[0]}"
    )
    assert abs(float(s[0, 4])) < 0.05


def test_kernel_path_uses_declared_attr_defaults():
    """With NO target attrs set, the packed-kernel cost path must apply the
    cost's declared defaults (target_z = 1.0), matching the scan path —
    previously the kernel packed 0.0 and the fused controller flew the
    quad toward the ground while CPU tests passed."""
    import jax.numpy as jnp

    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.08, "period_interpolation_inducing_points": 5,
        "num_rollouts": 64, "mpc_horizon": 10,
    })
    opt = ctrl.optimizer
    # Strip the attrs entirely: both paths must fall back to the same default.
    params = {k: v for k, v in ctrl._assemble_params().items()}
    params["attrs"] = {}

    K, H = 64, 10
    s_hover = jnp.tile(jnp.array([[0.0, 1.0, 0.0, 0.0, 0.0, 0.0]]), (K, 1))
    Q = jnp.full((K, H, 2), 0.327, jnp.float32)
    u_prev = jnp.full((2,), 0.327, jnp.float32)

    scan_cost = np.asarray(opt._fused_cost(s_hover, Q, u_prev, params))
    kernel_cost = np.asarray(
        opt._build_pallas_cost(interpret=True, tile_k=64)(s_hover, Q, u_prev, params)
    )
    np.testing.assert_allclose(kernel_cost, scan_cost, rtol=3e-5, atol=1e-4)
    # and at hover over (0, 1) the cost is tiny, not pos_weight * 1^2
    assert kernel_cost.max() < 1.0, f"kernel path targeting the ground: {kernel_cost[:3]}"
