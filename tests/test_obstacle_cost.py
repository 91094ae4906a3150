"""Obstacle-avoidance cost (pointmass/obstacles): navigation around discs,
scalar-attrs kernel compatibility, runtime obstacle motion."""
import jax
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.pointmass import PointMassEnv

OBS = {"obs0_x": 0.0, "obs0_y": 0.0, "obs0_r": 0.3}


def build(target=(1.0, 0.0), extra_attrs=None, **opt_overrides):
    attrs = {"target_x": target[0], "target_y": target[1]}
    attrs.update(OBS)
    attrs.update(extra_attrs or {})
    ctrl = MPCController(
        environment_name="pointmass",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes=attrs,
        config={"optimizer": "mppi", "controller_logging": False,
                "cost_function_specification": "obstacles"},
    )
    cfg = {"seed": 1, "mpc_timestep": 0.05, "mpc_horizon": 40,
           "num_rollouts": 512, "cc_weight": 1.0, "R": 1.0, "LBD": 2.0,
           "NU": 1000.0, "SQRTRHOINV": 0.12,
           "period_interpolation_inducing_points": 5}
    cfg.update(opt_overrides)
    ctrl.configure(optimizer_name="mppi", optimizer_config=cfg)
    return ctrl


def test_navigates_around_obstacle():
    """Straight line to the goal passes through the disc at the origin; the
    controller must detour and still arrive, never entering the disc."""
    ctrl = build()
    env = PointMassEnv(batch_size=1, dt=0.05, seed=0)
    env.reset()
    env.state = jnp.array([[-1.0, 0.0, 0.0, 0.0]], jnp.float32)
    s = np.asarray(env.state)
    min_d = np.inf
    for _ in range(150):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        s = np.asarray(s)
        min_d = min(min_d, float(np.hypot(s[0, 0], s[0, 1])))
    assert min_d > 0.3, f"entered the obstacle (min distance {min_d:.3f})"
    err = np.hypot(s[0, 0] - 1.0, s[0, 1])
    assert err < 0.2, f"never reached the goal: {s[0]} (err {err:.2f})"


def test_obstacles_move_without_recompile():
    """Obstacle attributes are jit arguments: moving a disc mid-run changes
    the cost immediately with zero recompilation."""
    ctrl = build()
    opt = ctrl.optimizer
    params = ctrl._assemble_params()
    K, H = 512, 40
    s_tiled = jnp.zeros((K, 4), jnp.float32)  # sitting at the origin
    Q = jnp.zeros((K, H, 2), jnp.float32)
    u_prev = jnp.zeros((2,), jnp.float32)

    c_on = float(opt._fused_cost(s_tiled, Q, u_prev, params)[0])
    params2 = dict(params)
    params2["attrs"] = dict(params["attrs"], obs0_x=jnp.float32(50.0))
    c_off = float(opt._fused_cost(s_tiled, Q, u_prev, params2)[0])
    # at the origin inside the disc, the penalty dominates; moving the disc
    # 50 m away removes it entirely
    assert c_on > c_off + 1.0, (c_on, c_off)


def test_kernel_matches_scan_with_obstacles():
    """The obstacle attrs ride the SMEM scalar vector: Pallas cost kernel
    agrees with the fused scan."""
    ctrl = build()
    opt = ctrl.optimizer
    pallas_cost = opt._build_pallas_cost(interpret=True, tile_k=128)
    params = ctrl._assemble_params()

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    K, H = 512, 40
    s_tiled = jnp.tile(
        jax.random.uniform(k1, (1, 4), minval=-1.0, maxval=1.0), (K, 1)
    )
    Q = jax.random.uniform(k2, (K, H, 2), minval=-1.0, maxval=1.0)
    u_prev = jnp.zeros((2,), jnp.float32)

    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = pallas_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=1e-4)


def test_car_navigates_around_obstacle():
    """Nonholonomic navigation: the car must PLAN a curve around the disc
    (it cannot strafe like the point mass)."""
    from control_toolkit_tpu.environments.car import CarEnv

    # Disc slightly off the start heading (a head-on PERFECTLY symmetric
    # disc is a knife-edge left/right decision that stalls finite-sample
    # MPPI — any real scene breaks that tie).
    ctrl = MPCController(
        environment_name="car",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={
            "target_x": 2.5, "target_y": 0.0,
            "obs0_x": 1.2, "obs0_y": 0.15, "obs0_r": 0.4,
        },
        config={"optimizer": "mppi", "controller_logging": False,
                "cost_function_specification": "obstacles"},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 60,
        "num_rollouts": 1024, "cc_weight": 1.0, "R": 1.0, "LBD": 2.0,
        "NU": 1000.0, "SQRTRHOINV": 0.2,
        "period_interpolation_inducing_points": 5,
    })
    ctrl.cost_function.cost_function.config.update(
        {"obstacle_weight": 400.0, "clearance": 0.2}
    )
    env = CarEnv(batch_size=1, dt=0.02, seed=0)
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)  # facing the obstacle
    s = np.asarray(env.state)
    min_d, best = np.inf, np.inf
    for _ in range(400):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        s = np.asarray(s)
        min_d = min(min_d, float(np.hypot(s[0, 0] - 1.2, s[0, 1] - 0.15)))
        best = min(best, float(np.hypot(s[0, 0] - 2.5, s[0, 1])))
    assert min_d > 0.4, f"car entered the obstacle (min distance {min_d:.3f})"
    assert best < 0.5, f"car never reached the goal (best {best:.2f}), final {s[0]}"


def test_cost_components_include_obstacles():
    ctrl = build()
    cf = ctrl.cost_function.cost_function
    states = jnp.zeros((2, 5, 4), jnp.float32)
    inputs = jnp.zeros((2, 5, 2), jnp.float32)
    comps = cf.cost_components(states, inputs, params=ctrl._assemble_params())
    assert "obstacles" in comps and float(comps["obstacles"][0, 0]) > 0.0