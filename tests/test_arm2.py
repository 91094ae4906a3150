"""Two-link manipulator family: dynamics sanity (energy, gravity
equilibrium, acrobot consistency), reaching MPC (multi-modal kinematics),
fast-math agreement, kernel-path parity."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.arm2 import Arm2Env
from control_toolkit_tpu.models.dynamics import (
    ARM2_DEFAULTS,
    arm2_dynamics,
)


def build(optimizer, cfg, target=(0.6, 0.4), spec=None):
    ctrl = MPCController(
        environment_name="arm2",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"target_x": target[0],
                                        "target_y": target[1]},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    full = {"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 40,
            "num_rollouts": 512}
    full.update(cfg)
    ctrl.configure(optimizer_name=optimizer, predictor_specification=spec,
                   optimizer_config=full)
    return ctrl


def test_energy_conserved_without_torque_or_damping():
    """Unforced, undamped arm: E = T + V must be constant under rk4."""
    from control_toolkit_tpu.models.predictors import rk4_step

    p = dict(ARM2_DEFAULTS, b=0.0)
    m1, m2, l1 = p["m1"], p["m2"], p["l1"]
    lc1, lc2, I1, I2, g = p["lc1"], p["lc2"], p["I1"], p["I2"], p["g"]

    def energy(s):
        t1, t1d, t2, t2d = s[..., 0], s[..., 1], s[..., 2], s[..., 3]
        c2 = jnp.cos(t2)
        M11 = m1 * lc1**2 + m2 * (l1**2 + lc2**2 + 2 * l1 * lc2 * c2) + I1 + I2
        M12 = m2 * (lc2**2 + l1 * lc2 * c2) + I2
        M22 = m2 * lc2**2 + I2
        T = 0.5 * (M11 * t1d**2 + 2 * M12 * t1d * t2d + M22 * t2d**2)
        y1 = -lc1 * jnp.cos(t1)
        y2 = -l1 * jnp.cos(t1) - lc2 * jnp.cos(t1 + t2)
        V = m1 * g * y1 + m2 * g * y2
        return T + V

    s = jnp.array([[0.7, 0.0, -0.4, 0.0]], jnp.float32)
    u = jnp.zeros((1, 2), jnp.float32)
    e0 = float(energy(s)[0])
    for _ in range(500):
        s = rk4_step(arm2_dynamics, s, u, 0.004, p)
    assert abs(float(energy(s)[0]) - e0) < 0.01 * max(1.0, abs(e0)), (
        f"energy drifted: {e0} -> {float(energy(s)[0])}"
    )


def test_hanging_down_is_equilibrium():
    s = jnp.zeros((1, 4), jnp.float32)
    u = jnp.zeros((1, 2), jnp.float32)
    d = arm2_dynamics(s, u, ARM2_DEFAULTS)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)


def test_matches_acrobot_when_shoulder_torque_zero():
    """With tau1 = 0 and matched parameters the arm IS an acrobot (elbow
    torque only) — cross-validates the manipulator algebra against the
    independently-written Spong acrobot equations."""
    from control_toolkit_tpu.models.dynamics import (
        ACROBOT_DEFAULTS,
        acrobot_dynamics,
    )

    shared = dict(ACROBOT_DEFAULTS)
    arm_p = dict(ARM2_DEFAULTS)
    arm_p.update({k: shared[k] for k in
                  ("m1", "m2", "l1", "lc1", "lc2", "I1", "I2", "u_max")})
    arm_p["g"] = shared["g"]
    arm_p["b"] = 0.0
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.uniform(-1.5, 1.5, (16, 4)).astype(np.float32))
    tau_elbow = jnp.asarray(rng.uniform(-1, 1, (16, 1)).astype(np.float32))
    u_arm = jnp.concatenate([jnp.zeros((16, 1)), tau_elbow], axis=1)
    d_arm = arm2_dynamics(s, u_arm, arm_p)
    d_acr = acrobot_dynamics(s, tau_elbow, shared)
    np.testing.assert_allclose(np.asarray(d_arm), np.asarray(d_acr),
                               rtol=2e-4, atol=2e-4)


def test_fast_dynamics_tracks_exact():
    rng = np.random.default_rng(1)
    s = jnp.asarray(rng.uniform(-2, 2, (64, 4)).astype(np.float32))
    u = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    d = arm2_dynamics(s, u, ARM2_DEFAULTS)
    df = arm2_dynamics.fast(s, u, ARM2_DEFAULTS)
    np.testing.assert_allclose(np.asarray(d), np.asarray(df),
                               rtol=1e-3, atol=2e-3)


def test_mppi_reaches_target():
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.25, "period_interpolation_inducing_points": 5,
    })
    env = Arm2Env(batch_size=1, dt=0.02, seed=3)
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)
    s = np.asarray(env.state)
    best = np.inf
    for _ in range(200):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        s = np.asarray(s)
        ex, ey = env.end_effector(jnp.asarray(s))
        x, y = float(ex[0]), float(ey[0])
        best = min(best, float(np.hypot(x - 0.6, y - 0.4)))
    assert best < 0.12, f"fingertip never reached target (best {best:.3f})"


def test_retarget_moves_arm_without_recompile():
    ctrl = build("mppi", {
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.25, "period_interpolation_inducing_points": 5,
    })
    env = Arm2Env(batch_size=1, dt=0.02, seed=4, target=(-0.5, -0.4))
    env.reset()
    env.state = jnp.zeros((1, 4), jnp.float32)
    s = np.asarray(env.state)
    for t in range(180):
        attrs = {"target_x": -0.5, "target_y": -0.4} if t >= 20 else None
        u = ctrl.step(s[0], updated_attributes=attrs)
        s, *_ = env.step(u)
        s = np.asarray(s)
    ex, ey = env.end_effector(jnp.asarray(s))
    x, y = float(ex[0]), float(ey[0])
    assert np.hypot(x + 0.5, y + 0.4) < 0.2, f"retarget missed: ({x:.2f},{y:.2f})"


def test_kernel_path_matches_scan():
    """The arm2 cost/dynamics flow through the fused-scan and (interpret)
    Pallas cost kernel identically."""
    ctrl = build("mppi", {
        "num_rollouts": 64, "mpc_horizon": 12,
        "cc_weight": 1.0, "R": 1.0, "LBD": 3.0, "NU": 1000.0,
        "SQRTRHOINV": 0.25, "period_interpolation_inducing_points": 4,
    })
    import jax

    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    rng = np.random.default_rng(2)
    s_tiled = jnp.tile(jnp.asarray([[0.3, 0.0, -0.2, 0.1]], jnp.float32),
                       (64, 1))
    Q = jnp.asarray(rng.uniform(-1, 1, (64, 12, 2)).astype(np.float32))
    u_prev = jnp.zeros((2,), jnp.float32)
    cost_scan = opt._fused_cost(s_tiled, Q, u_prev, params)
    from control_toolkit_tpu.ops.pallas_rollout import build_cost_rollout_kernel
    param_keys, pack, derivs, stage_soa, terminal_soa, pred = opt._soa_bindings()
    k = build_cost_rollout_kernel(
        derivs, stage_soa, terminal_soa, num_states=4, num_controls=2,
        horizon=12, dt=pred.dt, param_keys=param_keys,
        integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps, tile_k=32, interpret=True,
    )
    cost_kernel = k(s_tiled, Q, pack(params, u_prev))
    np.testing.assert_allclose(np.asarray(cost_kernel), np.asarray(cost_scan),
                               rtol=3e-5, atol=3e-5)


def test_cost_fk_seeds_from_dynamics():
    """ADVICE r2: the cost's FK link lengths follow the dynamics unless
    explicitly overridden — and an explicit mismatch warns loudly."""
    import logging

    # Unset in cost config -> seeded from the predictor's dynamics params.
    ctrl = build("mppi", {"num_rollouts": 64, "mpc_horizon": 10,
                          "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
                          "NU": 1000.0, "SQRTRHOINV": 0.1,
                          "period_interpolation_inducing_points": 5})
    pred = ctrl.predictor.predictor
    pred._defaults["l1"] = 0.7  # pretend a customized arm
    cf = ctrl.cost_function.cost_function
    cf.sync_with_dynamics(pred.default_params())
    assert float(cf.config["l1"]) == 0.7

    # Explicit cost-side value that disagrees with dynamics -> warning.
    # (The package logger doesn't propagate, so capture with our own
    # handler instead of caplog.)
    from control_toolkit_tpu.costs.arm2 import Arm2ReachCost

    records = []

    class _Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    grab = _Grab(level=logging.WARNING)
    logging.getLogger("control_toolkit_tpu.costs.arm2").addHandler(grab)
    try:
        cf2 = Arm2ReachCost(config={"l1": 0.3})
        cf2.sync_with_dynamics({"l1": 0.5, "l2": 0.5})
    finally:
        logging.getLogger("control_toolkit_tpu.costs.arm2").removeHandler(grab)
    assert any("different mechanism" in m for m in records)
    assert float(cf2.config["l1"]) == 0.3  # explicit value respected
    assert float(cf2.config["l2"]) == 0.5  # unset value still seeded
