"""Learned terminal value function (costs/value_terminal.py +
models/training.py fit_value_mlp / discounted_cost_to_go): a trained V(x)
added to any cost's terminal gives short-horizon MPC long-horizon
foresight (the MBVE / TD-MPC recipe)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.costs.value_terminal import (
    ValueTerminalCost, attach_value_terminal, update_value_params,
)
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import (
    discounted_cost_to_go, fit_value_mlp,
)
from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

from tests.test_ilqr import QuadCost, make_double_integrator

MPPI_CFG = dict(
    cc_weight=0.0, R=1.0, LBD=10.0, NU=1000.0, SQRTRHOINV=0.4,
    period_interpolation_inducing_points=1,
)


def _rand_value_net(key, S, hid=8):
    return nets.mlp_init(key, [S, hid, 1])


def _make_mppi(cost, horizon, seed=3, K=256):
    pred = make_double_integrator(0.1)
    opt = MPPIOptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-2.0], np.float32),
                        np.array([2.0], np.float32)),
        optimizer_logging=False, seed=seed, mpc_horizon=horizon,
        num_rollouts=K, **MPPI_CFG,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=pred.dt)
    return opt


# ---- unit: terminal composition -------------------------------------------

def test_terminal_adds_scaled_value_net():
    base = QuadCost()
    vp = _rand_value_net(jax.random.PRNGKey(0), 2)
    vt = ValueTerminalCost(base, vp, value_scale=2.5)
    params = vt.current_params()
    x = np.random.default_rng(1).normal(size=(16, 2)).astype(np.float32)
    got = vt.get_terminal_cost(jnp.asarray(x), params)
    want = (base.get_terminal_cost(jnp.asarray(x), params)
            + 2.5 * nets.mlp_apply(vp, jnp.asarray(x))[..., 0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    # stage costs untouched
    u = np.zeros((16, 1), np.float32)
    np.testing.assert_allclose(
        np.asarray(vt.stage_cost_step(jnp.asarray(x), jnp.asarray(u), None,
                                      params)),
        np.asarray(base.stage_cost_step(jnp.asarray(x), jnp.asarray(u), None,
                                        base.current_params())),
        atol=1e-6,
    )


def test_trajectory_cost_shifts_by_value_over_h_plus_1():
    base = QuadCost()
    vp = _rand_value_net(jax.random.PRNGKey(2), 2)
    vt = ValueTerminalCost(base, vp, value_scale=1.0)
    rng = np.random.default_rng(3)
    H = 7
    traj = jnp.asarray(rng.normal(size=(5, H + 1, 2)), jnp.float32)
    us = jnp.asarray(rng.normal(size=(5, H, 1)), jnp.float32)
    d = (vt.get_trajectory_cost(traj, us, params=vt.current_params())
         - base.get_trajectory_cost(traj, us, params=base.current_params()))
    want = nets.mlp_apply(vp, traj[:, -1, :])[..., 0] / (H + 1)
    np.testing.assert_allclose(np.asarray(d), np.asarray(want), atol=1e-5)


def test_wrapper_delegates_eligibility_and_scan_agrees():
    """The wrapper inherits the BASE cost's kernel eligibility (the cost
    kernels emit x_H and V rides post_terminal_cost outside the kernel);
    a plain-MLP V is also gradient-kernel eligible (in-kernel V)."""
    vt = ValueTerminalCost(QuadCost(), _rand_value_net(jax.random.PRNGKey(4), 2))
    assert vt.supports_fused_rollout
    assert vt.pallas_eligible is True  # delegates to QuadCost
    # the fused-scan cost path agrees with the trajectory path through the net
    opt = _make_mppi(vt, horizon=6, K=64)
    assert opt._post_terminal_fn() is not None
    assert opt._value_grad_spec() is not None  # in-kernel V eligible
    assert not opt._can_use_pallas_grad()  # CPU: kernels are TPU-only
    from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
    # the post hook is admitted only when the caller declares support
    assert not batched_kernel_core_ok(opt, force_scan=False)
    assert batched_kernel_core_ok(opt, force_scan=False, post_ok=True)
    cost_only = opt._make_cost_only()
    assert cost_only is not None  # fused scan engaged (CPU: no Pallas)
    params = opt.default_params()
    s_tiled = jnp.tile(jnp.asarray([[1.0, -0.5]], jnp.float32), (64, 1))
    Q = jax.random.uniform(jax.random.PRNGKey(5), (64, 6, 1), minval=-1.0,
                           maxval=1.0)
    u_prev = jnp.zeros((1,), jnp.float32)
    a = cost_only(s_tiled, Q, u_prev, params)
    b = opt._rollout_and_cost(s_tiled, Q, u_prev, params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ---- kernel fast path (interpret mode) --------------------------------------

def _mpc_ctrl(env="cartpole", optimizer="mppi", K=256, H=20, pred_spec=None):
    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    kw = {}
    if pred_spec:
        kw["predictor_specification"] = pred_spec
    ctrl.configure(optimizer_name=optimizer, optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 5,
    }, **kw)
    return ctrl


def _kernel_vs_scan(ctrl, build, K, H, tile):
    """Shared body: kernel+post vs fused scan (which evaluates the FULL
    wrapped terminal, V included, through XLA)."""
    opt = ctrl.optimizer
    assert opt._post_terminal_fn() is not None
    kernel_cost = build(opt, tile)
    key = jax.random.PRNGKey(11)
    S = opt.num_states
    s_tiled = jnp.tile(
        jax.random.uniform(key, (1, S), minval=-0.3, maxval=0.3), (K, 1)
    )
    Q = jax.random.uniform(jax.random.PRNGKey(12), (K, H, 1),
                           minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    params = ctrl._assemble_params()
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_value_terminal_rides_ode_cost_kernel():
    K, H = 256, 20
    ctrl = _mpc_ctrl(K=K, H=H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(6), 4),
                          value_scale=3.0)
    _kernel_vs_scan(
        ctrl, lambda opt, t: opt._build_pallas_cost(interpret=True, tile_k=t),
        K, H, 128,
    )


def test_value_terminal_rides_neural_cost_kernel():
    K, H = 256, 10
    ctrl = _mpc_ctrl(K=K, H=H, pred_spec="neural:mlp-16")
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(7), 4),
                          value_scale=2.0)
    _kernel_vs_scan(
        ctrl,
        lambda opt, t: opt._build_pallas_neural_cost(interpret=True, tile_k=t),
        K, H, 128,
    )


def test_value_terminal_sharded_cost_kernel_matches_unsharded():
    """The emit_terminal output threads through shard_map with the
    _cost_out_specs partitioning ([K] costs + [K,S] terminal states)."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H, tile = 256, 10, 32
    ctrl_a = _mpc_ctrl(K=K, H=H)
    vp = _rand_value_net(jax.random.PRNGKey(8), 4)
    attach_value_terminal(ctrl_a, vp, value_scale=1.5)
    opt_a = ctrl_a.optimizer
    unsharded = opt_a._build_pallas_cost(interpret=True, tile_k=tile)

    ctrl_b = _mpc_ctrl(K=K, H=H)
    attach_value_terminal(ctrl_b, vp, value_scale=1.5)
    opt_b = ctrl_b.optimizer
    opt_b.plan_sharding(make_rollout_mesh())
    sharded = opt_b._build_pallas_cost(interpret=True, tile_k=tile)

    key = jax.random.PRNGKey(13)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    pa = ctrl_a._assemble_params()
    pb = ctrl_b._assemble_params()
    a = unsharded(s_tiled, Q, u_prev, pa)
    b = sharded(s_tiled, Q, u_prev, pb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)


def test_value_terminal_semi_fused_mppi_kernel():
    """The semi-fused MPPI kernel with emit_terminal: costs2d gains
    V(x_H)/(H+1) before the softmax, and the resulting nominal update
    matches the modular XLA path on the SAME noise."""
    from control_toolkit_tpu.ops.pallas_mppi import ROWS
    from control_toolkit_tpu.optimizers.mppi import make_semi_fused_update

    K, H, tile = 256, 20, 128
    ctrl = _mpc_ctrl(K=K, H=H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(9), 4),
                          value_scale=4.0)
    opt = ctrl.optimizer
    post = opt._post_terminal_fn()
    assert post is not None
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    _, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    cost_run = opt._last_fused_make_run.external(K, emit_terminal=True)

    U = 1
    P = opt.interp.number_of_interpolation_inducing_points
    T, C = K // tile, tile // ROWS
    eps = jax.random.normal(jax.random.PRNGKey(5), (T, U, P * ROWS, C)) \
        * opt.SQRTRHODTINV

    sf_update = make_semi_fused_update(
        cost_run, pack, jnp.asarray(opt.interp.matrix, jnp.float32),
        opt.LBD, opt.action_low, opt.action_high, ROWS, T, C, P, U,
        post=post, cost_params=opt._cost_params, horizon=H,
    )
    s0 = jnp.array([0.1, -0.05, 0.3, 0.2], jnp.float32)
    u_nom = 0.1 * jnp.ones((1, H, U), jnp.float32)
    u_prev = jnp.array([0.2], jnp.float32)
    u_new, costs2d = sf_update(s0[None], u_nom, u_prev, params, eps)

    # Modular reference on the same noise: full terminal (V included)
    # through the fused scan + the MPPI correction cost.
    eps5 = np.asarray(eps).reshape(T, U, P, ROWS, C)
    eps_flat = np.transpose(eps5, (0, 3, 4, 2, 1)).reshape(K, P, U)
    delta = opt.interp.interpolate(jnp.asarray(eps_flat))
    u_run = jnp.clip(u_nom[0][None] + delta, -1.0, 1.0)
    s_tiled = jnp.tile(s0[None], (K, 1))
    base = opt._fused_cost(s_tiled, u_run, u_prev, params)
    corr = jnp.sum(
        opt.cc_weight * (0.5 * (1 - 1 / opt.NU) * opt.R * delta ** 2
                         + opt.R * u_run * delta + 0.5 * opt.R * u_run ** 2),
        axis=(1, 2),
    )
    ref = np.asarray(base + corr)
    got = np.zeros(K, np.float32)
    c2 = np.asarray(costs2d)
    for t in range(T):
        got[t * tile:(t + 1) * tile] = c2[:, t * C:(t + 1) * C].reshape(-1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    # Nominal update equals the full-tensor weighted average with V in
    # the weights.
    w = np.exp(-(ref - ref.min()) / opt.LBD)
    b_ref = np.asarray(
        jnp.sum(jnp.asarray(w)[:, None, None] * delta, axis=0) / w.sum()
    )
    u_ref = np.clip(np.asarray(u_nom[0]) + b_ref, -1.0, 1.0)
    np.testing.assert_allclose(np.asarray(u_new[0]), u_ref, rtol=1e-4,
                               atol=1e-5)


# ---- AoS delegation (ADVICE r3) ---------------------------------------------

def test_wrapper_preserves_aos_overrides():
    """A base cost that overrides _get_stage_cost / get_terminal_cost
    directly (e.g. the trajectory-tracking pointmass cost) keeps its
    custom behavior under the wrapper — the stage cost keeps its
    time-indexed reference terms and the custom terminal is the one V is
    added to."""
    from control_toolkit_tpu.costs.pointmass import PointMassTrajectoryCost

    base = PointMassTrajectoryCost()
    base.configure(batch_size=8, horizon=5)
    vp = _rand_value_net(jax.random.PRNGKey(10), 4)
    vt = ValueTerminalCost(base, vp, value_scale=2.0)
    assert vt.supports_fused_rollout == base.supports_fused_rollout
    params = vt.current_params()
    rng = np.random.default_rng(4)
    states = jnp.asarray(rng.normal(size=(8, 5, 4)), jnp.float32)
    inputs = jnp.asarray(rng.normal(size=(8, 5, 2)), jnp.float32)
    term = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(vt._get_stage_cost(states, inputs, None, params)),
        np.asarray(base._get_stage_cost(states, inputs, None, params)),
        atol=1e-6,
    )
    want = (base.get_terminal_cost(term, params)
            + 2.0 * nets.mlp_apply(vp, term)[..., 0])
    np.testing.assert_allclose(
        np.asarray(vt.get_terminal_cost(term, params)), np.asarray(want),
        atol=1e-5,
    )


def test_attach_twice_updates_instead_of_nesting():
    from test_optimizer_zoo import make

    ctrl = make("mppi", logging=False)
    vp1 = _rand_value_net(jax.random.PRNGKey(14), 4)
    w1 = attach_value_terminal(ctrl, vp1, value_scale=1.0)
    vp2 = jax.tree_util.tree_map(lambda w: w * 0.5, vp1)
    w2 = attach_value_terminal(ctrl, vp2, value_scale=2.0)
    assert w1 is w2  # updated in place, not nested
    assert not isinstance(w2.base, ValueTerminalCost)
    assert w2.value_scale == 2.0
    with pytest.raises(ValueError):
        ValueTerminalCost(w2, vp1)  # direct nesting refused


# ---- training utilities ----------------------------------------------------

def test_discounted_cost_to_go():
    g = np.array([1.0, 2.0, 4.0], np.float32)
    out = discounted_cost_to_go(g, gamma=0.5)
    np.testing.assert_allclose(out, [1 + 0.5 * (2 + 0.5 * 4), 2 + 2.0, 4.0],
                               atol=1e-6)


def test_discounted_cost_to_go_bootstrap_tail():
    """tail_value bootstraps the truncated tail (fitted-value-iteration
    rounds, round-5 recipe): G_T := V(x_T) instead of 0."""
    g = np.array([1.0, 2.0], np.float32)
    out = discounted_cost_to_go(g, gamma=0.5, tail_value=8.0)
    np.testing.assert_allclose(
        out, [1 + 0.5 * (2 + 0.5 * 8.0), 2 + 0.5 * 8.0], atol=1e-6)
    # tail_value=0 recovers the plain form exactly
    np.testing.assert_allclose(
        discounted_cost_to_go(g, gamma=0.5, tail_value=0.0),
        discounted_cost_to_go(g, gamma=0.5), atol=0)


def test_fit_value_mlp_learns_a_quadratic():
    """Also covers the normalization folding: the returned params are a
    plain mlp_apply net in RAW units."""
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(4096, 2)).astype(np.float32)
    ys = (xs ** 2).sum(-1) + 0.3
    params, mse = fit_value_mlp(xs, ys, hiddens=(64,), epochs=3000,
                                learning_rate=3e-3, seed=1)
    assert mse < 0.05, mse
    pred = np.asarray(nets.mlp_apply(params, jnp.asarray(xs)))[:, 0]
    assert float(np.mean((pred - ys) ** 2)) < 0.05


# ---- the headline behavior -------------------------------------------------

def _closed_loop_cost(opt, pred, base_cost, s0, ticks=40):
    """Roll the optimizer against the true plant; realized cost under the
    BASE stage cost (the value term must help, not re-define the score)."""
    params = pred.default_params()
    cp = base_cost.current_params()
    x = jnp.asarray(s0, jnp.float32)[None]
    total, u_prev = 0.0, jnp.zeros((1, 1), jnp.float32)
    for _ in range(ticks):
        u = jnp.reshape(jnp.asarray(opt.step(np.asarray(x[0]))), (1, 1))
        total += float(base_cost.stage_cost_step(x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0])
        x = pred.single_step(x, u, params)
        u_prev = u
    return total


class PosCost(CostFunction):
    """Position-only stage cost: myopia genuinely hurts here (a short
    horizon never sees the velocity it is building up), so the learned
    terminal has real foresight to contribute."""
    dynamic_config_keys = ("r",)

    def __init__(self, config=None):
        super().__init__({"r": 0.1, **(config or {})})

    def _stage_cost_core_soa(self, xs, us, params):
        return (0.5 * xs[0] * xs[0]
                + 0.5 * params["cost"]["r"] * sum(u * u for u in us))


def test_myopic_mppi_improves_with_learned_value():
    """The full workflow: collect expert episodes (LQR + exploration
    noise, covering the eval region), fit V on the discounted realized
    cost-to-go, then show SHORT-horizon (H=3) MPPI with the learned
    terminal clearly beats plain H=3 MPPI on aggregate realized cost —
    the point of amortizing horizon into a value net."""
    from tests.test_ilqr import lqr_gain

    dt = 0.1
    A = np.array([[1, dt], [0, 1]], np.float32)
    B = np.array([[0], [dt]], np.float32)
    K = lqr_gain(A, B, np.diag([1.0, 1e-3]).astype(np.float32),
                 np.array([[0.1]], np.float32))
    pred = make_double_integrator(dt)
    base = PosCost()
    cp = base.current_params()
    dynp = pred.default_params()

    # 1) expert data: noisy LQR episodes from a grid of starts (the noise
    #    widens coverage off the expert manifold — V must generalize to
    #    the states the myopic planner actually visits)
    rng = np.random.default_rng(0)
    states, ctgs = [], []
    for s0 in [(a, b) for a in (-1.5, -0.75, 0.0, 0.75, 1.5)
               for b in (-1.0, 0.0, 1.0)]:
        x = jnp.asarray(s0, jnp.float32)[None]
        u_prev = jnp.zeros((1, 1), jnp.float32)
        ep_states, ep_costs = [], []
        for _ in range(60):
            u = jnp.clip(-(x @ jnp.asarray(K).T) + 0.3 * rng.normal(),
                         -2.0, 2.0)
            ep_costs.append(float(base.stage_cost_step(
                x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0]))
            ep_states.append(np.asarray(x[0]))
            x = pred.single_step(x, u, dynp)
            u_prev = u
        states.append(np.stack(ep_states))
        ctgs.append(discounted_cost_to_go(np.asarray(ep_costs), gamma=0.97))
    xs, ys = np.concatenate(states), np.concatenate(ctgs)

    # 2) fit V
    vparams, mse = fit_value_mlp(xs, ys, hiddens=(32, 32), epochs=2000,
                                 learning_rate=3e-3, seed=2)
    assert mse < 0.1, mse

    # 3) myopic with vs without the learned terminal, aggregated over starts
    plain = _make_mppi(PosCost(), horizon=3, seed=7)
    valued = _make_mppi(ValueTerminalCost(PosCost(), vparams), horizon=3,
                        seed=7)
    j_plain = j_valued = 0.0
    for s0 in ([1.4, -0.6], [-1.0, 0.9], [0.5, 1.2]):
        plain.optimizer_reset()
        valued.optimizer_reset()
        j_plain += _closed_loop_cost(plain, pred, base, s0)
        j_valued += _closed_loop_cost(valued, pred, base, s0)
    # measured ~0.59 on this recipe; 0.75 leaves sampling-noise headroom
    assert j_valued < 0.75 * j_plain, (j_valued, j_plain)


def test_attach_and_hot_swap_on_controller():
    """attach_value_terminal wraps an MPCController's cost in place;
    update_value_params hot-swaps a re-fit net with ZERO recompiles."""
    from test_optimizer_zoo import make

    ctrl = make("mppi", logging=False)
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    u0 = ctrl.step(s)
    vp = _rand_value_net(jax.random.PRNGKey(8), 4)
    attach_value_terminal(ctrl, vp, value_scale=5.0)
    u1 = ctrl.step(s)
    assert ctrl.optimizer._step_jit._cache_size() == 1
    # a re-fit hot-swap: same pytree structure, new leaves -> no retrace
    vp2 = jax.tree_util.tree_map(lambda w: w + 0.5, vp)
    update_value_params(ctrl, vp2)
    u2 = ctrl.step(s)
    assert ctrl.optimizer._step_jit._cache_size() == 1, "hot-swap retraced"
    assert np.all(np.isfinite(u1)) and np.all(np.isfinite(u2))
    assert not np.allclose(u1, u2)  # the new net reached the step
    with pytest.raises(ValueError):
        update_value_params(make("mppi", logging=False), vp2)


# ---- batched columns kernel (interpret mode) ---------------------------------

def test_value_terminal_rides_batched_mppi_columns_kernel():
    """The columnwise batched semi-fused MPPI kernel emits terminal states
    and V is added per session BEFORE the softmax — checked exactly
    against a per-session XLA reference (trajectory cost through the
    wrapped cost, V included, plus the MPPI correction term)."""
    from control_toolkit_tpu.optimizers.mppi import MPPIState

    B, K, H, tile, ROWS = 4, 64, 10, 128, 8
    ctrl = _mpc_ctrl(K=K, H=H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(21), 4),
                          value_scale=4.0)
    opt = ctrl.optimizer
    step, update_from_eps = opt._make_batched_semi_fused_step(
        B, interpret=True, tile_k=tile
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points
    cps = K // ROWS
    T = (B * K) // tile
    C = tile // ROWS

    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(0), i)
                      for i in range(B)])
    st = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(1)
    states = MPPIState(
        key=st.key,
        u_nom=jnp.asarray(rng.uniform(
            -0.4, 0.4, size=np.asarray(st.u_nom).shape), jnp.float32),
        u_prev=jnp.asarray(rng.uniform(
            -0.5, 0.5, size=np.asarray(st.u_prev).shape), jnp.float32),
    )
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    eps = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(T, U, P * ROWS, C)),
        jnp.float32,
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, params["dyn"], params["cost"], attrs, eps
    )
    assert u_nom_new.shape == (B, H, U) and costs.shape == (B, K)

    # ---- per-session XLA reference (V included via get_trajectory_cost) ----
    W = np.asarray(opt.interp.matrix, np.float32)
    Wk = np.kron(W.T, np.eye(ROWS, dtype=np.float32))
    eps_cols = np.asarray(eps).transpose(1, 2, 0, 3).reshape(
        U, P * ROWS, T * C)
    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)
        eps_b = eps_cols[:, :, b * cps:(b + 1) * cps]
        delta = np.stack([Wk @ eps_b[j] for j in range(U)])
        Q = np.zeros((K, H, U), np.float32)
        du = np.zeros((K, H, U), np.float32)
        for r in range(ROWS):
            for cw in range(cps):
                for j in range(U):
                    d = delta[j, np.arange(H) * ROWS + r, cw]
                    du[r * cps + cw, :, j] = d
                    Q[r * cps + cw, :, j] = np.clip(
                        un_shift[:, j] + d, -1.0, 1.0)
        s_tiled = jnp.tile(s_b[b], (K, 1))
        traj = opt.predictor.rollout(s_tiled, jnp.asarray(Q), params["dyn"])
        cparams = {
            "cost": params["cost"],
            "attrs": {"target_position": attrs["target_position"][b]},
        }
        base = opt.cost_function.get_trajectory_cost(
            traj, jnp.asarray(Q), states.u_prev[b], cparams
        )
        corr = np.sum(
            opt.cc_weight * (
                0.5 * (1 - 1 / opt.NU) * opt.R * du**2
                + opt.R * Q * du + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        ref_cost = np.asarray(base) + corr
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=3e-4, rtol=3e-5
        )


def test_value_terminal_batched_gate_post_ok():
    """batched_kernel_core_ok rejects a post-terminal hook by default and
    admits it only with post_ok=True (the semi-fused MPPI / mppi-var
    columns kernels, which emit terminal states)."""
    from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok

    vt = ValueTerminalCost(QuadCost(), _rand_value_net(jax.random.PRNGKey(4), 2))
    opt = _make_mppi(vt, horizon=6, K=64)
    assert not batched_kernel_core_ok(opt, force_scan=False)
    assert batched_kernel_core_ok(opt, force_scan=False, post_ok=True)
    # force_scan still wins even with post_ok
    assert not batched_kernel_core_ok(opt, force_scan=True, post_ok=True)


def test_attach_value_terminal_batched_controller():
    """attach_value_terminal on a configured BatchedMPCController installs
    a persistent wrap hook and rebuilds the batched program (configure
    recreates the cost wrapper, so a plain wrap would be silently dropped)
    — V reaches the batched objective and survives a re-configure."""
    from control_toolkit_tpu.controllers.batched_mpc import (
        BatchedMPCController,
    )

    def make():
        ctrl = BatchedMPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "mppi", "controller_logging": False},
        )
        ctrl.configure(optimizer_name="mppi", optimizer_config={
            "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": 8,
            "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 4,
        }, num_slots=2)
        return ctrl

    plain = make()
    valued = make()
    vp = _rand_value_net(jax.random.PRNGKey(13), 4)
    vt = attach_value_terminal(valued, vp, value_scale=8.0)
    assert isinstance(vt, ValueTerminalCost)
    assert valued.cost_function.cost_function is vt

    s = np.tile(np.array([0.4, 0.0, 0.3, 0.0], np.float32), (2, 1))
    u_plain = plain.step_batch(s)
    u_valued = valued.step_batch(s)
    assert np.all(np.isfinite(u_plain)) and np.all(np.isfinite(u_valued))
    # the V term reached the batched program's objective
    assert not np.allclose(u_plain, u_valued)

    # the wrap survives a re-configure (the hook re-applies)
    stash_args, stash_kwargs = valued._configure_stash
    valued.configure(*stash_args, **stash_kwargs)
    assert isinstance(valued.cost_function.cost_function, ValueTerminalCost)
    u_again = valued.step_batch(s)
    np.testing.assert_allclose(np.asarray(u_again), np.asarray(u_valued),
                               atol=1e-6)


# ---- GRADIENT kernels: in-kernel V with dV/dQ (interpret mode) ---------------

def _grad_kernel_vs_ad(ctrl, build, K, H, tile, swap_net_key=None):
    """Kernel (cost, dQ) vs the fused scan + jax.grad, where the wrapped
    terminal (V included) participates in XLA AD — the dV/dQ ground
    truth.  ``swap_net_key``: re-fit hot-swap check — update the value
    net (same structure) and verify the SAME kernel tracks the new V."""
    opt = ctrl.optimizer
    assert opt._value_grad_spec() is not None
    grad_kernel = build(opt, tile)
    S = opt.num_states
    s_tiled = jnp.tile(
        jax.random.uniform(jax.random.PRNGKey(11), (1, S),
                           minval=-0.3, maxval=0.3), (K, 1))
    Q = jax.random.uniform(jax.random.PRNGKey(12), (K, H, 1),
                           minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)

    def check():
        params = ctrl._assemble_params()
        ref_cost = opt._fused_cost(s_tiled, Q, u_prev, params)
        ref_grad = jax.grad(
            lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
        )(Q)
        cost, dq = grad_kernel(s_tiled, Q, u_prev, params)
        np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_cost),
                                   rtol=1e-4, atol=1e-4)
        # tolerances as in test_pallas_neural_grad (accumulation order)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(ref_grad),
                                   rtol=1e-3, atol=5e-4)
        return np.asarray(dq)

    dq1 = check()
    if swap_net_key is not None:
        update_value_params(
            ctrl, _rand_value_net(swap_net_key, S, hid=8))
        dq2 = check()  # same kernel, new V operands — still exact
        assert not np.allclose(dq1, dq2)  # and the swap actually mattered


def test_value_terminal_rides_ode_grad_kernel():
    K, H = 256, 20
    ctrl = _mpc_ctrl(K=K, H=H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(21), 4),
                          value_scale=3.0)
    _grad_kernel_vs_ad(
        ctrl, lambda opt, t: opt._build_pallas_grad(interpret=True, tile_k=t),
        K, H, 128, swap_net_key=jax.random.PRNGKey(22),
    )


def test_value_terminal_rides_neural_grad_kernel():
    K, H = 256, 10
    ctrl = _mpc_ctrl(K=K, H=H, pred_spec="neural:mlp-16")
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(23), 4),
                          value_scale=2.0)
    _grad_kernel_vs_ad(
        ctrl,
        lambda opt, t: opt._build_pallas_neural_grad(interpret=True, tile_k=t),
        K, H, 128,
    )


def test_value_terminal_rides_ensemble_grad_kernel():
    """Member-stacked dynamics weights + member-SHARED value operands:
    the runner's operand split (member index_map for the net, whole-array
    for V) must compose."""
    from tests.test_pallas_neural_grad import make_ensemble_rpgd

    K, H, E = 128, 12, 4
    ctrl = make_ensemble_rpgd(K, H, E)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(24), 4),
                          value_scale=2.0)
    _grad_kernel_vs_ad(
        ctrl,
        lambda opt, t: opt._build_pallas_ensemble_grad(interpret=True,
                                                       tile_k=t),
        K, H, 16,
    )


def test_value_grad_spec_rejects_exotic_nets():
    """Only plain mlp_init-shaped nets ride in-kernel; anything else
    (extra keys — e.g. a norm-carrying checkpoint) keeps XLA-AD."""
    ctrl = _mpc_ctrl(K=64, H=8)
    vp = _rand_value_net(jax.random.PRNGKey(25), 4)
    attach_value_terminal(ctrl, vp)
    assert ctrl.optimizer._value_grad_spec() == {"n_layers": 2}
    ctrl.cost_function.cost_function.value_params = {
        **vp, "norm_in_mean": jnp.zeros(4)}
    assert ctrl.optimizer._value_grad_spec() is None


@pytest.mark.slow  # default-tier representative: test_value_terminal_rides_ode_grad_kernel
def test_value_terminal_rides_batched_rpgd_columns_kernel():
    """The columns gradient kernels carry a plain-MLP V in-kernel (gcall)
    and the columns cost kernel emits terminals with V added outside
    (ccall) — the full batched RPGD step must match the single-session
    step_fn (XLA-AD scan on CPU, V in AD) per session."""
    from tests.test_pallas_batched import make_rpgd_ctrl, _rpgd_states

    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_rpgd_ctrl(K, H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(31), 4),
                          value_scale=3.0)
    opt = ctrl.optimizer
    assert opt._value_grad_spec() is not None
    kstep = opt._make_batched_rpgd_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = _rpgd_states(opt, B)
    rng = np.random.default_rng(19)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):       # resample branch, then keep branch
        u, new_states, costs = kstep(
            states, s_b, params["dyn"], params["cost"],
            {"target_position": attrs_vec},
        )
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda x: x[b], states)
            p_b = {
                "dyn": params["dyn"], "cost": params["cost"],
                "attrs": {"target_position": attrs_vec[b]},
            }
            u_ref, new_ref, diag = step_fn(st_b, s_b[b], p_b)
            np.testing.assert_allclose(
                np.asarray(u)[b], np.asarray(u_ref), atol=5e-4, rtol=5e-4
            )
            np.testing.assert_allclose(
                np.asarray(costs)[b], np.asarray(diag["J_logged"]),
                atol=5e-4, rtol=5e-4,
            )
            np.testing.assert_allclose(
                np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
                atol=5e-4, rtol=5e-4,
            )
        states = new_states


def test_value_terminal_batched_grad_gates_post_ok():
    """BatchedMPC + ClosedLoop sweep gates admit a plain-MLP value
    terminal on the columns gradient kernels (and still reject an exotic
    one)."""
    from tests.test_pallas_batched import make_rpgd_ctrl

    ctrl = make_rpgd_ctrl(32, 10)
    vp = _rand_value_net(jax.random.PRNGKey(32), 4)
    attach_value_terminal(ctrl, vp)
    opt = ctrl.optimizer
    from control_toolkit_tpu.optimizers.base import batched_kernel_core_ok
    assert batched_kernel_core_ok(
        opt, force_scan=False, post_ok=opt._value_grad_spec() is not None)
    ctrl.cost_function.cost_function.value_params = {
        **vp, "norm_in_mean": jnp.zeros(4)}
    assert not batched_kernel_core_ok(
        opt, force_scan=False, post_ok=opt._value_grad_spec() is not None)


@pytest.mark.slow  # default-tier representative: test_value_terminal_batched_grad_gates_post_ok
def test_value_terminal_composes_with_per_slot_dyn_rpgd_kernel():
    """Per-slot dyn pslot rows + session-shared in-kernel V in one
    batched RPGD kernel step == per-session XLA-AD step_fn with that
    session's dyn dict (operand order: pslot, dyn weights, value ops)."""
    from tests.test_pallas_batched import make_rpgd_ctrl, _rpgd_states

    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_rpgd_ctrl(K, H)
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(33), 4),
                          value_scale=3.0)
    opt = ctrl.optimizer
    kstep = opt._make_batched_rpgd_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=("L",)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    L = np.array([0.4, 0.85], np.float32)
    dyn_b = dict(params["dyn"], L=jnp.asarray(L))
    states = _rpgd_states(opt, B)
    rng = np.random.default_rng(23)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    u, new_states, costs = kstep(
        states, s_b, dyn_b, params["cost"], {"target_position": attrs_vec},
    )
    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda x: x[b], states)
        p_b = {
            "dyn": dict(params["dyn"], L=jnp.asarray(L[b])),
            "cost": params["cost"],
            "attrs": {"target_position": attrs_vec[b]},
        }
        u_ref, new_ref, _ = step_fn(st_b, s_b[b], p_b)
        np.testing.assert_allclose(
            np.asarray(u)[b], np.asarray(u_ref), atol=5e-4, rtol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
            atol=5e-4, rtol=5e-4,
        )


def test_value_terminal_rides_batched_neural_columns_kernel():
    """The columns-mode NEURAL cost kernel emits terminal states and V
    joins the per-session costs before the softmax — checked against a
    per-session XLA reference whose trajectory cost goes through the
    WRAPPED cost (V included)."""
    from tests.test_pallas_batched import make_states
    from tests.test_pallas_neural import make_neural_mppi

    B, K, H, tile = 4, 128, 10, 128
    ctrl = make_neural_mppi(K, H, net="mlp-16")
    attach_value_terminal(ctrl, _rand_value_net(jax.random.PRNGKey(41), 4),
                          value_scale=4.0)
    opt = ctrl.optimizer
    _, update_from_eps = opt._make_batched_neural_step(
        B, interpret=True, tile_k=tile
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points

    states = make_states(opt, B)
    rng = np.random.default_rng(17)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    delta_b = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(B, K, P, U)), jnp.float32
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, params["dyn"], params["cost"], attrs, delta_b
    )
    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)
        delta = np.asarray(opt.interp.interpolate(delta_b[b]))
        Q = np.clip(un_shift[None] + delta, -1.0, 1.0)
        s_tiled = jnp.tile(s_b[b], (K, 1))
        traj = opt.predictor.rollout(s_tiled, jnp.asarray(Q), params["dyn"])
        cparams = {
            "cost": params["cost"],
            "attrs": {"target_position": attrs["target_position"][b]},
        }
        base = opt.cost_function.get_trajectory_cost(  # wrapped: V included
            traj, jnp.asarray(Q), states.u_prev[b], cparams
        )
        corr = np.sum(
            opt.cc_weight * (
                0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                + opt.R * Q * delta + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        ref_cost = np.asarray(base) + corr
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=2e-4, rtol=2e-4
        )


def test_hot_reload_flag_delegates_through_wrapper():
    """The YAML watcher raises the reload flag on the BASE cost it
    registered BEFORE the wrap; the wrapper-aware flag property must see
    and consume it through the CostFunctionWrapper (review r5 — without
    the delegation, hot-reload went silently dead after attach)."""
    ctrl = _mpc_ctrl()
    vt = attach_value_terminal(
        ctrl, _rand_value_net(jax.random.PRNGKey(30), 4))
    base = vt.base
    assert ctrl.cost_function.update_cost_parameters_from_config() is False
    base.reload_cost_parameters_from_config_flag = True  # what updater.py does
    assert vt.reload_cost_parameters_from_config_flag is True
    assert ctrl.cost_function.update_cost_parameters_from_config() is True
    assert base.reload_cost_parameters_from_config_flag is False


def test_value_survives_reconfigure_with_latest_net():
    """configure() recreates the cost wrapper; the persistent wrap hook
    must re-wrap with the CURRENT net (post update_value_params), on the
    SCALAR controller too (review r5 — the hook used to exist only for
    batched controllers and closed over attach-time weights)."""
    ctrl = _mpc_ctrl()
    vp1 = _rand_value_net(jax.random.PRNGKey(31), 4)
    attach_value_terminal(ctrl, vp1, value_scale=2.0)
    vp2 = jax.tree_util.tree_map(lambda w: w + 1.0, vp1)
    update_value_params(ctrl, vp2)
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 20,
        "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 5,
    })
    inner = ctrl.cost_function.cost_function
    assert isinstance(inner, ValueTerminalCost)
    assert inner.value_scale == 2.0
    for a, b in zip(jax.tree_util.tree_leaves(inner.value_params),
                    jax.tree_util.tree_leaves(vp2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And a re-attach with new weights also reaches post-configure wraps.
    vp3 = jax.tree_util.tree_map(lambda w: w - 0.25, vp1)
    attach_value_terminal(ctrl, vp3, value_scale=1.5)
    ctrl.configure(optimizer_name="mppi", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 20,
        "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
        "NU": 1000.0, "SQRTRHOINV": 0.05,
        "period_interpolation_inducing_points": 5,
    })
    inner = ctrl.cost_function.cost_function
    assert inner.value_scale == 1.5
    for a, b in zip(jax.tree_util.tree_leaves(inner.value_params),
                    jax.tree_util.tree_leaves(vp3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
