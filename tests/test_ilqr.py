"""iLQR optimizer tests: LQR agreement on a linear system + closed loop."""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.optimizers.ilqr import ILQROptimizer
from control_toolkit_tpu.utils import registry


class QuadCost(CostFunction):
    """0.5 x'Qx + 0.5 u'Ru with Q=I, R=rI."""

    dynamic_config_keys = ("r",)
    DEFAULTS = {"r": 0.1}

    def __init__(self, config=None):
        merged = dict(self.DEFAULTS)
        merged.update(config or {})
        super().__init__(merged)

    def _stage_cost_core_soa(self, xs, us, params):
        r = params["cost"]["r"]
        return 0.5 * sum(x * x for x in xs) + 0.5 * r * sum(u * u for u in us)


def make_double_integrator(dt=0.1):
    """Continuous double integrator: x'' = u."""
    def derivs_soa(xs, us, p):
        pos, vel = xs
        return (vel, us[0] * p["gain"])
    from control_toolkit_tpu.models.dynamics import soa_to_aos
    dyn = soa_to_aos(derivs_soa, 2, 1)
    return ODEPredictor(
        dynamics=dyn, num_states=2, num_control_inputs=1,
        dt=dt, integrator="euler", params={"gain": 1.0},
    )


def lqr_gain(A, B, Q, R, iters=500):
    """Discrete-time infinite-horizon LQR via Riccati iteration."""
    P = Q.copy()
    for _ in range(iters):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
    return np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)


def build_ilqr(pred, cost, H=40, bounds=50.0, iters=30):
    opt = ILQROptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-bounds], np.float32), np.array([bounds], np.float32)),
        optimizer_logging=True, seed=0, mpc_horizon=H,
        max_iterations=iters, tol=1e-9, regularization_init=1.0,
        regularization_max=1e8, line_search_steps=8,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    return opt


def test_ilqr_matches_lqr_on_double_integrator():
    dt = 0.1
    pred = make_double_integrator(dt)
    cost = QuadCost()
    opt = build_ilqr(pred, cost)

    # discrete euler system matrices
    A = np.array([[1.0, dt], [0.0, 1.0]], np.float32)
    B = np.array([[0.0], [dt]], np.float32)
    K = lqr_gain(A, B, np.eye(2, dtype=np.float32), np.array([[0.1]], np.float32))

    for x0 in ([1.0, 0.0], [0.5, -1.0], [-2.0, 0.3]):
        s = np.array(x0, np.float32)
        u = opt.step(s, params={"dyn": {"gain": jnp.float32(1.0)},
                                "cost": cost.current_params()["cost"],
                                "attrs": {}})
        u_lqr = float(-(K @ s)[0])
        # long horizon => receding-horizon first action ~ infinite-horizon LQR
        assert abs(float(u[0]) - u_lqr) < 0.05 * max(1.0, abs(u_lqr)), (
            f"x0={x0}: ilqr {float(u[0])} vs lqr {u_lqr}"
        )


def test_ilqr_cost_decreases_monotonically():
    pred = make_double_integrator()
    cost = QuadCost()
    opt = build_ilqr(pred, cost, iters=2)
    s = np.array([2.0, 0.0], np.float32)
    params = {"dyn": {"gain": jnp.float32(1.0)},
              "cost": cost.current_params()["cost"], "attrs": {}}
    opt.step(s, params=params)
    j2 = float(opt.logging_values["J_logged"][0])
    opt.optimizer_reset()
    opt.max_iterations = 30
    opt._build()
    opt.step(s, params=params)
    j30 = float(opt.logging_values["J_logged"][0])
    assert j30 <= j2 + 1e-6


def test_ilqr_closed_loop_cartpole():
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "ilqr", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="ilqr", optimizer_config={
        "seed": 0, "mpc_timestep": 0.02, "mpc_horizon": 40, "num_rollouts": 1,
        "max_iterations": 15, "tol": 1e-7, "regularization_init": 1.0,
        "regularization_max": 1e8, "line_search_steps": 6,
    })
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=7)
    s, _ = env.reset()
    for _ in range(50):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.1, f"ilqr failed to stabilize: {s[0]}"
