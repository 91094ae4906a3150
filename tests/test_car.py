"""Kinematic-bicycle car family: turning-geometry sanity, waypoint MPC for a
nonholonomic vehicle, fast-math agreement."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.car import CarEnv


def build(optimizer, cfg, target=(2.0, 1.0)):
    ctrl = MPCController(
        environment_name="car",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"target_x": target[0], "target_y": target[1]},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    full = {"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 40, "num_rollouts": 512}
    full.update(cfg)
    ctrl.configure(optimizer_name=optimizer, optimizer_config=full)
    return ctrl


def test_turning_geometry():
    """At constant speed and steering, yaw rate must equal v*tan(delta)/L."""
    from control_toolkit_tpu.models.dynamics import CAR_DEFAULTS, car_dynamics

    p = CAR_DEFAULTS
    v = 2.0
    x = jnp.array([[0.0, 0.0, 0.3, v]])
    u = jnp.array([[0.5, 0.0]])  # steer = 0.5 * steer_max
    d = car_dynamics(x, u, p)
    expected_yawd = v * np.tan(0.5 * p["steer_max"]) / p["wheelbase"]
    np.testing.assert_allclose(float(d[0, 2]), expected_yawd, rtol=1e-5)
    # nonholonomic: velocity direction == heading
    np.testing.assert_allclose(float(d[0, 0]), v * np.cos(0.3), rtol=1e-5)
    np.testing.assert_allclose(float(d[0, 1]), v * np.sin(0.3), rtol=1e-5)


def test_speed_is_bounded_under_full_throttle():
    env = CarEnv(batch_size=1, dt=0.02, seed=0)
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)
    u = np.array([[0.0, 1.0]], np.float32)
    for _ in range(600):
        s, *_ = env.step(u)
    assert float(s[0, 3]) < 1.5 * env.params["v_max"]


def test_mppi_drives_to_waypoint():
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 2.0, "NU": 1000.0,
        "SQRTRHOINV": 0.15, "period_interpolation_inducing_points": 5,
    })
    env = CarEnv(batch_size=1, dt=0.02, seed=3)
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)  # at origin, facing +x
    s = np.asarray(env.state)
    best = np.inf
    for _ in range(300):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        s = np.asarray(s)
        best = min(best, float(np.hypot(s[0, 0] - 2.0, s[0, 1] - 1.0)))
    assert best < 0.4, f"never reached waypoint (best distance {best:.2f}), final {s[0]}"


def test_waypoint_behind_requires_turning():
    """Target behind the start heading: the nonholonomic car must swing
    around, not strafe."""
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 2.0, "NU": 1000.0,
        "SQRTRHOINV": 0.15, "period_interpolation_inducing_points": 5,
        "mpc_horizon": 50,
    }, target=(-2.0, 0.0))
    env = CarEnv(batch_size=1, dt=0.02, seed=5)
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)
    s = np.asarray(env.state)
    best = np.inf
    for _ in range(400):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        s = np.asarray(s)
        best = min(best, float(np.hypot(s[0, 0] + 2.0, s[0, 1])))
    assert best < 0.5, f"never reached rear waypoint (best {best:.2f}), final {s[0]}"


def test_fast_math_variant_matches_exact():
    from control_toolkit_tpu.models.predictors import PredictorWrapper

    exact, fast = PredictorWrapper(), PredictorWrapper()
    exact.configure(batch_size=8, horizon=50, dt=0.02,
                    predictor_specification="ODE:rk4:1",
                    environment_name="car")
    fast.configure(batch_size=8, horizon=50, dt=0.02,
                   predictor_specification="ODE:rk4:1:fast",
                   environment_name="car")
    rng = np.random.default_rng(0)
    s0 = jnp.asarray(rng.normal(0, 0.5, (8, 4)), jnp.float32)
    Q = jnp.asarray(rng.uniform(-1, 1, (8, 50, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(fast.rollout(s0, Q)), np.asarray(exact.rollout(s0, Q)),
        atol=5e-3,
    )
