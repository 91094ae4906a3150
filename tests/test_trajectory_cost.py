"""Time-varying reference-trajectory cost (pointmass/trajectory): array
attributes through the attrs pipeline, per-step reference windows, closed-
loop path following."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.pointmass import PointMassEnv

DT = 0.05
H = 30


def circle_ref(t0, n, radius=1.0, omega=0.6):
    """Reference positions at times t0 + [0..n-1]*DT along a circle."""
    t = t0 + DT * np.arange(n, dtype=np.float32)
    return (radius * np.cos(omega * t)).astype(np.float32), (
        radius * np.sin(omega * t)
    ).astype(np.float32)


def build():
    rx, ry = circle_ref(0.0, H + 1)
    ctrl = MPCController(
        environment_name="pointmass",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"ref_x": rx, "ref_y": ry},
        config={"optimizer": "mppi", "controller_logging": False,
                "cost_function_specification": "trajectory"},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 1, "mpc_timestep": DT, "mpc_horizon": H, "num_rollouts": 512,
        "cc_weight": 1.0, "R": 1.0, "LBD": 2.0, "NU": 1000.0,
        "SQRTRHOINV": 0.15, "period_interpolation_inducing_points": 5,
    })
    return ctrl


def test_on_reference_trajectory_costs_zero():
    ctrl = build()
    cf = ctrl.cost_function.cost_function
    rx, ry = circle_ref(0.0, H + 1)
    traj = np.zeros((2, H + 1, 4), np.float32)
    traj[:, :, 0] = rx
    traj[:, :, 1] = ry
    inputs = np.zeros((2, H, 2), np.float32)
    params = ctrl._assemble_params()
    on_ref = np.asarray(cf.get_trajectory_cost(
        jnp.asarray(traj), jnp.asarray(inputs), None, params
    ))
    np.testing.assert_allclose(on_ref, 0.0, atol=1e-5)

    traj_off = traj.copy()
    traj_off[:, :, 0] += 0.5
    off_ref = np.asarray(cf.get_trajectory_cost(
        jnp.asarray(traj_off), jnp.asarray(inputs), None, params
    ))
    assert np.all(off_ref > 1.0)


def test_closed_loop_follows_moving_circle():
    """The point mass must follow the rotating reference: per-step the
    controller receives the NEXT window of the circle as array attributes
    (same shapes -> no recompilation)."""
    ctrl = build()
    env = PointMassEnv(batch_size=1, dt=DT, seed=0)
    env.reset()
    env.state = jnp.array([[1.0, 0.0, 0.0, 0.0]], jnp.float32)  # on the circle
    s = np.asarray(env.state)
    errs = []
    for i in range(120):
        t = i * DT
        rx, ry = circle_ref(t, H + 1)
        u = ctrl.step(s[0], updated_attributes={"ref_x": rx, "ref_y": ry})
        s, *_ = env.step(u)
        s = np.asarray(s)
        errs.append(float(np.hypot(s[0, 0] - rx[0], s[0, 1] - ry[0])))
    tail_err = float(np.mean(errs[40:]))
    assert tail_err < 0.25, f"poor tracking: mean tail error {tail_err:.3f}"


def test_fused_paths_are_excluded():
    ctrl = build()
    cf = ctrl.cost_function.cost_function
    assert not cf.supports_fused_rollout  # _get_stage_cost overridden
    opt = ctrl.optimizer
    assert not opt._can_use_pallas()


def test_kernel_pack_rejects_array_attr_clearly():
    """A scalar-attr cost whose RUNTIME attribute arrives as an array must
    fail with the actionable message, not a cryptic stack error."""
    import pytest

    ctrl = MPCController(
        environment_name="pointmass",
        control_limits=(np.array([-1.0, -1.0], np.float32),
                        np.array([1.0, 1.0], np.float32)),
        initial_environment_attributes={"target_x": 0.0, "target_y": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 1, "mpc_timestep": DT, "mpc_horizon": 10, "num_rollouts": 64,
        "cc_weight": 1.0, "R": 1.0, "LBD": 2.0, "NU": 1000.0,
        "SQRTRHOINV": 0.15, "period_interpolation_inducing_points": 5,
    })
    opt = ctrl.optimizer
    _, pack, *_ = opt._soa_bindings()
    params = ctrl._assemble_params()
    params = dict(params)
    params["attrs"] = {"target_x": jnp.zeros((5,)), "target_y": 0.0}
    with pytest.raises(ValueError, match="array-valued"):
        pack(params, jnp.zeros((2,), jnp.float32))
