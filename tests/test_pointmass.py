"""Point-mass (2-input) model family: closed loops with asymmetric per-input
bounds, multi-input Pallas kernel agreement, iLQR with U>1."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.pointmass import PointMassEnv


def build(optimizer, cfg, low=(-1.0, -1.0), high=(1.0, 1.0), target=(1.0, -0.5),
          logging=False):
    ctrl = MPCController(
        environment_name="pointmass",
        control_limits=(np.array(low, np.float32), np.array(high, np.float32)),
        initial_environment_attributes={"target_x": target[0], "target_y": target[1]},
        config={"optimizer": optimizer, "controller_logging": logging},
    )
    full = {"seed": 2, "mpc_timestep": 0.02, "mpc_horizon": 25, "num_rollouts": 256}
    full.update(cfg)
    ctrl.configure(optimizer_name=optimizer, optimizer_config=full)
    return ctrl


MPPI_CFG = {"cc_weight": 1.0, "R": 1.0, "LBD": 10.0, "NU": 1000.0,
            "SQRTRHOINV": 0.1, "period_interpolation_inducing_points": 5}


def run_closed_loop(ctrl, steps=120):
    env = PointMassEnv(batch_size=1, dt=0.02, seed=4)
    s, _ = env.reset()
    for _ in range(steps):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    return np.asarray(s[0]), np.asarray(u)


def test_mppi_reaches_target_two_inputs():
    ctrl = build("mppi", MPPI_CFG)
    s, _ = run_closed_loop(ctrl)
    # sampling noise + control cost leave a small steady-state offset
    assert abs(s[0] - 1.0) < 0.2 and abs(s[1] + 0.5) < 0.2, f"missed target: {s}"


def test_asymmetric_bounds_respected_closed_loop():
    """fy in [-1, 0.05]: the controller can barely push +y, so reaching a
    +y target must take much longer / stall while -y stays easy, and every
    emitted control respects its own bounds."""
    low, high = (-1.0, -1.0), (1.0, 0.05)
    ctrl = build("mppi", MPPI_CFG, low=low, high=high, target=(0.0, 1.5))
    env = PointMassEnv(batch_size=1, dt=0.02, seed=4)
    s, _ = env.reset(seed=9)
    us = []
    for _ in range(60):
        u = ctrl.step(s[0])
        us.append(np.asarray(u))
        s, *_ = env.step(u)
    us = np.stack(us)
    assert np.all(us[:, 0] >= low[0] - 1e-6) and np.all(us[:, 0] <= high[0] + 1e-6)
    assert np.all(us[:, 1] >= low[1] - 1e-6) and np.all(us[:, 1] <= high[1] + 1e-6)
    assert us[:, 1].max() <= 0.05 + 1e-6


def test_pallas_cost_kernel_two_inputs_matches_scan():
    """The modular cost-rollout kernel on a 2-input model (interpret mode)
    must match the fused-scan reference."""
    ctrl = build("mppi", MPPI_CFG)
    opt = ctrl.optimizer
    K, H = 256, 25
    pallas_cost = opt._build_pallas_cost(interpret=True, tile_k=128)
    key = jax.random.PRNGKey(1)
    s_tiled = jnp.tile(jnp.array([[1.5, -0.5, 0.2, 0.1]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 2), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.3, -0.2], jnp.float32)
    params = ctrl._assemble_params()
    ref = np.asarray(opt._fused_cost(s_tiled, Q, u_prev, params))
    out = np.asarray(pallas_cost(s_tiled, Q, u_prev, params))
    np.testing.assert_allclose(out, ref, rtol=3e-5, atol=1e-4)


def test_semi_fused_two_inputs_matches_reference():
    """Semi-fused MPPI kernel with U=2 and per-input bounds (interpret)."""
    from control_toolkit_tpu.ops.pallas_mppi import ROWS

    ctrl = build("mppi", MPPI_CFG, low=(-0.3, -1.0), high=(1.0, 0.2))
    opt = ctrl.optimizer
    K, H, tile = 256, 25, 128
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    _, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    cost_run = opt._last_fused_make_run.external(K)

    U, P = 2, opt.interp.number_of_interpolation_inducing_points
    T, C = K // tile, tile // ROWS
    eps = jax.random.normal(jax.random.PRNGKey(8), (T, U, P * ROWS, C)) * opt.SQRTRHODTINV
    s0 = jnp.array([1.0, -0.5, 0.0, 0.0], jnp.float32)
    u_nom = jnp.zeros((H, U), jnp.float32)
    u_prev = jnp.zeros((U,), jnp.float32)
    costs2d = np.asarray(cost_run(s0, u_nom, pack(params, u_prev), eps))

    # reference with the same noise, per-input clipping
    low = jnp.array([-0.3, -1.0]); high = jnp.array([1.0, 0.2])
    eps5 = np.asarray(eps).reshape(T, U, P, ROWS, C)
    eps_flat = np.transpose(eps5, (0, 3, 4, 2, 1)).reshape(K, P, U)
    delta = opt.interp.interpolate(jnp.asarray(eps_flat))
    u_run = jnp.clip(u_nom[None] + delta, low, high)
    s_tiled = jnp.tile(s0[None], (K, 1))
    base = opt._fused_cost(s_tiled, u_run, u_prev, params)
    corr = jnp.sum(
        opt.cc_weight * (0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                         + opt.R * u_run * delta + 0.5 * opt.R * u_run**2),
        axis=(1, 2),
    )
    ref = np.asarray(base + corr)
    got = np.zeros(K, np.float32)
    for t in range(T):
        got[t * tile:(t + 1) * tile] = costs2d[:, t * C:(t + 1) * C].reshape(-1)
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)


def test_bounded_update_fixes_asymmetric_clip_bias():
    """Reference MPPI adds the weighted average of RAW perturbations to the
    nominal; with sampling noise large relative to a tight asymmetric
    ceiling, the ceiling-clipped tail (identical realized trajectories,
    identical weights, unbounded raw deltas) drags the nominal to the near
    bound even when the optimum is u = 0.  bounded_update (weighted average
    of the executed controls) replaces that unbounded drift with a bounded
    softmax bias strictly inside the box.  Isolated on a static
    velocity-control system where the optimal control is exactly zero."""
    import jax.numpy as jnp

    from control_toolkit_tpu.costs.base import CostFunction
    from control_toolkit_tpu.models.dynamics import soa_to_aos
    from control_toolkit_tpu.models.predictors import ODEPredictor
    from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

    class HoldCost(CostFunction):
        dynamic_config_keys = ()

        def _stage_cost_core_soa(self, xs, us, params):
            return 100.0 * xs[0] ** 2

    dyn = soa_to_aos(lambda xs, us, p: (us[0] * p["gain"],), 1, 1)
    pred = ODEPredictor(dynamics=dyn, num_states=1, num_control_inputs=1,
                        dt=0.1, integrator="euler", params={"gain": 1.0})

    def nominal_after(bounded, steps=30):
        opt = MPPIOptimizer(
            predictor=pred, cost_function=HoldCost(),
            control_limits=(np.array([-1.0], np.float32),
                            np.array([0.05], np.float32)),
            optimizer_logging=False, seed=0, num_rollouts=512, mpc_horizon=10,
            cc_weight=0.0, R=1.0, LBD=0.5, NU=1000.0, SQRTRHOINV=0.22,
            period_interpolation_inducing_points=2, bounded_update=bounded,
        )
        opt.configure(num_states=1, num_control_inputs=1, dt=0.1)
        params = {"dyn": {"gain": jnp.float32(1.0)}, "cost": {}, "attrs": {}}
        s = np.zeros(1, np.float32)
        for _ in range(steps):
            opt.step(s, params=params)  # state held at the optimum x=0
        return float(np.asarray(opt.opt_state.u_nom).mean())

    u_raw = nominal_after(False)
    u_bounded = nominal_after(True)
    # raw-delta rule RAILS at the near (ceiling) bound; executed-control
    # averaging keeps a bounded softmax bias, strictly inside the box and
    # far closer to the optimum u = 0
    assert u_raw > 0.045, f"expected raw-delta rail at ceiling, got {u_raw}"
    assert -0.2 < u_bounded < 0.04, f"bounded update railed/biased: {u_bounded}"


def test_ilqr_two_inputs_reaches_target():
    ctrl = build("ilqr", {"num_rollouts": 1, "max_iterations": 20, "tol": 1e-7,
                          "regularization_init": 1.0, "regularization_max": 1e8,
                          "line_search_steps": 6})
    s, _ = run_closed_loop(ctrl, steps=100)
    assert abs(s[0] - 1.0) < 0.1 and abs(s[1] + 0.5) < 0.1, f"missed target: {s}"


def test_imitator_input_wiring_pointmass(tmp_path):
    """STATE_INDICES wiring for the 2-input env's named states/controls."""
    from control_toolkit_tpu.models.dynamics import (
        CONTROL_NAMES, STATE_NAMES, state_indices,
    )

    assert STATE_NAMES["pointmass"] == ["x", "y", "xD", "yD"]
    assert CONTROL_NAMES["pointmass"] == ["Fx", "Fy"]
    assert state_indices("pointmass")["yD"] == 3
