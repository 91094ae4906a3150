"""iLQR optimizer tests: LQR agreement on a linear system + closed loop."""
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_ilqr_state_box_constraint_active_at_optimum():
    """Drive the double integrator from x=2 to 0 with a velocity bound the
    unconstrained optimum violates; the AL solve must respect it
    (reference FORCES state box, optimizer_nlp_forces.py:146-152)."""
    pred = make_double_integrator(dt=0.1)
    cost = QuadCost({"r": 0.001})  # cheap control -> aggressive unconstrained v
    params = {"dyn": {"gain": jnp.float32(1.0)},
              "cost": cost.current_params()["cost"], "attrs": {}}
    s = np.array([2.0, 0.0], np.float32)

    free = ILQROptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-50.0], np.float32), np.array([50.0], np.float32)),
        optimizer_logging=True, seed=0, mpc_horizon=30, max_iterations=40,
        tol=1e-9, regularization_init=1.0, regularization_max=1e8,
        line_search_steps=8,
    )
    free.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    free.step(s, params=params)
    v_free = np.abs(free.logging_values["rollout_trajectories_logged"][0, :, 1])
    assert v_free.max() > 0.8, "test premise: unconstrained plan must exceed bound"

    vmax = 0.6
    con = ILQROptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-50.0], np.float32), np.array([50.0], np.float32)),
        optimizer_logging=True, seed=0, mpc_horizon=30, max_iterations=40,
        tol=1e-9, regularization_init=1.0, regularization_max=1e8,
        line_search_steps=8,
        state_max=["inf", vmax], al_iterations=5, mu_init=10.0, mu_growth=10.0,
    )
    con.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    con.step(s, params=params)
    v_con = np.abs(con.logging_values["rollout_trajectories_logged"][0, :, 1])
    assert v_con.max() <= vmax + 0.02, f"velocity bound violated: {v_con.max()}"
    # the bound binds: the constrained plan rides close to it
    assert v_con.max() > 0.5 * vmax


def test_ilqr_terminal_set_reached():
    """Terminal box around an attr-named target (reference :299-306): the
    open-loop plan must end inside target +/- width."""
    pred = make_double_integrator(dt=0.1)
    cost = QuadCost({"r": 10.0})  # expensive control -> lazy unconstrained plan
    params = {"dyn": {"gain": jnp.float32(1.0)},
              "cost": cost.current_params()["cost"],
              "attrs": {"target_position": jnp.float32(1.5)}}
    s = np.array([0.0, 0.0], np.float32)

    opt = ILQROptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-50.0], np.float32), np.array([50.0], np.float32)),
        optimizer_logging=True, seed=0, mpc_horizon=25, max_iterations=40,
        tol=1e-9, regularization_init=1.0, regularization_max=1e8,
        line_search_steps=8,
        terminal_set_width=0.05, idx_terminal_set=[0],
        terminal_set_center=["target_position"],
        al_iterations=5, mu_init=10.0, mu_growth=10.0,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    opt.step(s, params=params)
    x_final = float(opt.logging_values["rollout_trajectories_logged"][0, -1, 0])
    assert abs(x_final - 1.5) <= 0.05 + 0.01, f"terminal set missed: {x_final}"


def test_ilqr_solver_failure_replays_previous_plan():
    """FORCES exitflag<0 semantics (reference :315-342): a failed solve
    replays the last good open-loop plan index-by-index, then recovers."""
    pred = make_double_integrator(dt=0.1)
    cost = QuadCost()
    opt = build_ilqr(pred, cost, H=10, iters=20)
    good = {"dyn": {"gain": jnp.float32(1.0)},
            "cost": cost.current_params()["cost"], "attrs": {}}
    bad = {"dyn": {"gain": jnp.float32(np.nan)},
           "cost": cost.current_params()["cost"], "attrs": {}}
    s = np.array([1.0, 0.0], np.float32)

    u0 = opt.step(s, params=good)
    plan = np.asarray(opt.opt_state.plan).copy()
    assert int(opt.opt_state.j) == 0

    # Failure 1: replay plan[1]; failure 2: replay plan[2].
    u1 = opt.step(s, params=bad)
    assert int(opt.opt_state.j) == 1
    np.testing.assert_allclose(u1, plan[1], atol=1e-6)
    u2 = opt.step(s, params=bad)
    assert int(opt.opt_state.j) == 2
    np.testing.assert_allclose(u2, plan[2], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(opt.opt_state.plan), plan)

    # Recovery: fresh solve adopted, index reset.
    u3 = opt.step(s, params=good)
    assert int(opt.opt_state.j) == 0
    assert np.all(np.isfinite(u3))
    assert not np.allclose(np.asarray(opt.opt_state.plan), plan)


@pytest.mark.slow
def test_ilqr_includes_control_change_cost():
    """The NLP slot must optimize the SAME objective as the sampling
    optimizers: with a heavy ccrc weight the plan gets smoother (round-1
    gap: the coupling term was dropped)."""
    from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost

    def solve_with(ccrc_weight):
        from control_toolkit_tpu.models.dynamics import (
            CARTPOLE_DEFAULTS, cartpole_dynamics,
        )
        pred = ODEPredictor(
            dynamics=cartpole_dynamics, num_states=4, num_control_inputs=1,
            dt=0.02, integrator="rk4", params=dict(CARTPOLE_DEFAULTS),
        )
        cost = CartpoleQuadraticCost({"ccrc_weight": ccrc_weight})
        opt = ILQROptimizer(
            predictor=pred, cost_function=cost,
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            optimizer_logging=True, seed=0, mpc_horizon=30, max_iterations=25,
            tol=1e-9, regularization_init=1.0, regularization_max=1e8,
            line_search_steps=8,
        )
        opt.configure(num_states=4, num_control_inputs=1, dt=0.02)
        params = {"dyn": {k: jnp.float32(v) for k, v in CARTPOLE_DEFAULTS.items()},
                  "cost": cost.current_params()["cost"],
                  "attrs": {"target_position": jnp.float32(0.0)}}
        opt.step(np.array([0.0, 0.0, 0.35, 0.0], np.float32), params=params)
        plan = opt.logging_values["Q_logged"][0, :, 0]
        return np.abs(np.diff(plan)).max()

    rough = solve_with(0.0)
    smooth = solve_with(500.0)
    assert smooth < 0.5 * rough, (
        f"heavy ccrc weight must smooth the plan: {smooth} vs {rough}"
    )


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


@pytest.mark.slow
def test_multistart_escapes_local_minimum():
    """iLQR is local: with a pure quadratic cost (no energy shaping) a
    single solve from the hanging pendulum converges to the hang (u=0 is a
    stationary point); n_starts vmapped random initializations find the
    swing-up basin and the lowest-true-cost plan wins."""
    from control_toolkit_tpu.environments.pendulum import PendulumEnv

    def final_angle_from_top(n_starts, steps=80):
        ctrl = MPCController(
            "pendulum",
            (np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            {}, config={"optimizer": "ilqr", "controller_logging": False},
        )
        ctrl.configure(optimizer_name="ilqr", optimizer_config={
            "seed": 2, "mpc_timestep": 0.05, "mpc_horizon": 40,
            "num_rollouts": 1, "max_iterations": 25, "tol": 1e-7,
            "regularization_init": 1.0, "regularization_max": 1e8,
            "line_search_steps": 8, "n_starts": n_starts,
        })
        cf = ctrl.cost_function.cost_function
        cf.config["energy_weight"] = 0.0  # remove the shaping that rescues n=1
        ctrl._cost_params = None
        env = PendulumEnv(batch_size=1, dt=0.05, seed=0)
        env.reset()
        env.state = jnp.array([[np.pi, 0.0]], jnp.float32)  # exactly hanging
        s = np.asarray(env.state)
        for _ in range(steps):
            u = ctrl.step(s[0])
            s, *_ = env.step(u)
        ang = float(s[0, 0]) % (2 * np.pi)
        return min(ang, 2 * np.pi - ang)

    stuck = final_angle_from_top(1)
    solved = final_angle_from_top(6)
    assert stuck > 2.5, f"premise: single start should stay hanging, got {stuck}"
    assert solved < 0.15, f"multi-start failed to swing up: {solved}"


def _make_cartpole_ilqr(riccati, H=30, state_max=None, al=1):
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
        "max_iterations": 20, "al_iterations": al, "line_search_steps": 8,
        "n_starts": 1, "riccati": riccati,
    }
    if state_max is not None:
        cfg["state_max"] = state_max
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "ilqr", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="ilqr", optimizer_config=cfg)
    return ctrl


@pytest.mark.slow
def test_parallel_riccati_gains_match_sequential():
    """The associative-scan backward pass must reproduce the sequential
    Riccati gains exactly (fp tolerance) on IDENTICAL linearization inputs:
    the LM regularizer folds into the stage control cost, making both the
    DP of the same modified LQR.  (Full multi-iteration solves only agree
    loosely — fp ordering differences compound through line-search
    branches — so the per-pass equality is the rigorous assertion.)"""
    import jax

    ctrl = _make_cartpole_ilqr("sequential")
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    seq_bw, par_bw = opt._debug_backward_pair
    H, U = 30, 1
    rng = np.random.default_rng(0)
    z0 = jnp.asarray(np.array([0.15, -0.3, 0.35, 0.2, 0.0], np.float32))
    us = jnp.asarray(rng.uniform(-0.8, 0.8, (H, U)).astype(np.float32))
    zs = opt._debug_rollout(z0, us, params)
    lam = jnp.zeros((H + 1, 0), jnp.float32)
    lam_t = jnp.zeros((0,), jnp.float32)
    center = jnp.zeros((0,), jnp.float32)
    for reg in (1e-6, 1.0, 100.0):
        ks1, Ks1 = seq_bw(zs, us, lam, lam_t, 0.0, center,
                          jnp.float32(reg), params)
        ks2, Ks2 = par_bw(zs, us, lam, lam_t, 0.0, center,
                          jnp.float32(reg), params)
        np.testing.assert_allclose(np.asarray(ks1), np.asarray(ks2),
                                   rtol=2e-3, atol=2e-5)
        np.testing.assert_allclose(np.asarray(Ks1), np.asarray(Ks2),
                                   rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_parallel_riccati_constrained_matches():
    """Per-pass equivalence must survive the augmented-Lagrangian terms
    (nonzero lam and mu enter the stage quadratics)."""
    import jax

    ctrl = _make_cartpole_ilqr("sequential",
                               state_max=["inf", 1.5, "inf", "inf"], al=3)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    seq_bw, par_bw = opt._debug_backward_pair
    H = 30
    rng = np.random.default_rng(1)
    z0 = jnp.asarray(np.array([0.5, 0.1, 0.3, -0.2, 0.0], np.float32))
    us = jnp.asarray(rng.uniform(-0.8, 0.8, (H, 1)).astype(np.float32))
    zs = opt._debug_rollout(z0, us, params)
    lam = jnp.asarray(rng.uniform(0.0, 2.0, (H + 1, 2)).astype(np.float32))
    lam_t = jnp.zeros((0,), jnp.float32)
    center = jnp.zeros((0,), jnp.float32)
    mu = jnp.float32(10.0)
    ks1, Ks1 = seq_bw(zs, us, lam, lam_t, mu, center, jnp.float32(1.0), params)
    ks2, Ks2 = par_bw(zs, us, lam, lam_t, mu, center, jnp.float32(1.0), params)
    np.testing.assert_allclose(np.asarray(ks1), np.asarray(ks2),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Ks1), np.asarray(Ks2),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_parallel_riccati_closed_loop():
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv

    ctrl = _make_cartpole_ilqr("parallel", H=40)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(50):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.4, f"pole fell: {s[0]}"


def test_riccati_mode_validation():
    import pytest

    with pytest.raises(ValueError, match="riccati"):
        _make_cartpole_ilqr("banana")


@pytest.mark.slow
def test_heuristic_policy_initial_guess():
    """Reference FORCES heuristic warm start (optimizer_nlp_forces.py:
    261-279): a policy rollout seeds the first plan and an extra start.
    With zero solver iterations... iLQR always iterates, so instead verify
    (a) the policy guess changes the first-tick solve trajectory under a
    tight iteration budget, (b) multi-start with the policy start runs and
    wins no worse than without it."""
    dt = 0.1
    pred = make_double_integrator(dt)
    cost = QuadCost()

    def lqr_policy(x, params):
        return jnp.asarray([-1.2 * x[0] - 1.9 * x[1]])

    def build(policy, n_starts=1, iters=1):
        opt = ILQROptimizer(
            predictor=pred, cost_function=cost,
            control_limits=(np.array([-50.0], np.float32),
                            np.array([50.0], np.float32)),
            optimizer_logging=False, seed=0, mpc_horizon=20,
            max_iterations=iters, tol=1e-9, regularization_init=1.0,
            regularization_max=1e8, line_search_steps=4,
            n_starts=n_starts, initial_guess_policy=policy,
        )
        opt.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
        return opt

    s = np.array([1.5, -0.5], np.float32)

    # (a) one inner iteration from a policy guess lands elsewhere than one
    # iteration from the mid-range default -> the guess really seeds the solve.
    u_pol = build(lqr_policy, iters=1).step(s)
    u_mid = build(None, iters=1).step(s)
    assert np.all(np.isfinite(u_pol)) and np.all(np.isfinite(u_mid))
    assert not np.allclose(u_pol, u_mid)

    # With a generous budget both converge to the same optimum (the guess
    # changes the path, not the answer, on this convex problem).
    u_pol_full = build(lqr_policy, iters=30).step(s)
    u_mid_full = build(None, iters=30).step(s)
    np.testing.assert_allclose(u_pol_full, u_mid_full, atol=1e-3)

    # (b) multi-start including the policy start runs and is finite.
    opt3 = build(lqr_policy, n_starts=3, iters=10)
    u3 = opt3.step(s)
    assert np.all(np.isfinite(u3))
