"""Columnwise (batched-session) semi-fused MPPI kernel — interpret mode.

One kernel launch evaluates B independent MPC sessions packed along the
lane axis (ops/pallas_mppi.py kernel1_cols + MPPIOptimizer.
_make_batched_semi_fused_step).  Checked EXACTLY against an XLA reference
that replays the same injected noise through the modular rollout/cost/
softmax math, per session.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.optimizers.mppi import MPPIState
from test_pallas_rollout import make_mppi_ctrl

ROWS = 8


def build(B=4, K=64, H=10, tile=128):
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    step, update_from_eps = opt._make_batched_semi_fused_step(
        B, interpret=True, tile_k=tile
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    return ctrl, opt, step, update_from_eps, params


def make_states(opt, B, key_seed=0):
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(key_seed), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    # Distinct nominal plans and previous controls per session so the
    # per-column context paths (unom rows, __u_prev rows) are exercised.
    rng = np.random.default_rng(1)
    u_nom = jnp.asarray(
        rng.uniform(-0.4, 0.4, size=np.asarray(states.u_nom).shape), jnp.float32
    )
    u_prev = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=np.asarray(states.u_prev).shape), jnp.float32
    )
    return MPPIState(key=states.key, u_nom=u_nom, u_prev=u_prev)


def test_batched_kernel_matches_xla_reference():
    B, K, H, tile = 4, 64, 10, 128
    ctrl, opt, _, update_from_eps, params = build(B, K, H, tile)
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points
    cps = K // ROWS
    T = (B * K) // tile
    C = tile // ROWS

    states = make_states(opt, B)
    rng = np.random.default_rng(7)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    # Distinct per-session target so the attr rows matter.
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    eps = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(T, U, P * ROWS, C)), jnp.float32
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, params["dyn"], params["cost"], attrs, eps
    )
    assert u_nom_new.shape == (B, H, U) and costs.shape == (B, K)

    # ---- XLA reference, session by session --------------------------------
    W = np.asarray(opt.interp.matrix, np.float32)              # [P, H]
    Wk = np.kron(W.T, np.eye(ROWS, dtype=np.float32))          # [H*R, P*R]
    eps_cols = np.asarray(eps).transpose(1, 2, 0, 3).reshape(U, P * ROWS, T * C)
    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:], np.asarray(states.u_nom)[b, 0, -1:]],
            axis=0,
        )                                                      # [H, U]
        eps_b = eps_cols[:, :, b * cps:(b + 1) * cps]          # [U, P*R, cps]
        # delta at full horizon for rollout (r, cw):
        delta = np.stack([Wk @ eps_b[j] for j in range(U)])    # [U, H*R, cps]
        Q = np.zeros((K, H, U), np.float32)
        for r in range(ROWS):
            for cw in range(cps):
                for j in range(U):
                    Q[r * cps + cw, :, j] = np.clip(
                        un_shift[:, j] + delta[j, np.arange(H) * ROWS + r, cw],
                        -1.0, 1.0,
                    )
        s_tiled = jnp.tile(s_b[b], (K, 1))
        traj = opt.predictor.rollout(s_tiled, jnp.asarray(Q), params["dyn"])
        cparams = {
            "cost": params["cost"],
            "attrs": {"target_position": attrs["target_position"][b]},
        }
        base = opt.cost_function.get_trajectory_cost(
            traj, jnp.asarray(Q), states.u_prev[b], cparams
        )
        du = np.zeros((K, H, U), np.float32)
        for r in range(ROWS):
            for cw in range(cps):
                for j in range(U):
                    du[r * cps + cw, :, j] = delta[j, np.arange(H) * ROWS + r, cw]
        corr = np.sum(
            opt.cc_weight * (
                0.5 * (1 - 1 / opt.NU) * opt.R * du**2
                + opt.R * Q * du + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        ref_cost = np.asarray(base) + corr
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=2e-4, rtol=2e-5
        )

        rho = ref_cost.min()
        w = np.exp(-(ref_cost - rho) / opt.LBD)
        a = w.sum()
        # weighted average at the inducing points, per session
        eps_k = np.zeros((K, P, U), np.float32)
        for r in range(ROWS):
            for cw in range(cps):
                for j in range(U):
                    eps_k[r * cps + cw, :, j] = eps_b[j, np.arange(P) * ROWS + r, cw]
        ws = np.einsum("k,kpu->up", w, eps_k) / a
        b_upd = np.einsum("ph,up->hu", W, ws)
        ref_unom = np.clip(un_shift + b_upd, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(u_nom_new)[b], ref_unom, atol=1e-5, rtol=1e-5
        )


def test_batched_step_results_independent_of_batch_size():
    """Session b's control depends only on its own state/key, not on B."""
    _, opt4, step4, _, params = build(B=4, K=64, H=10, tile=128)
    _, opt2, step2, _, _ = build(B=2, K=64, H=10, tile=128)

    states4 = make_states(opt4, 4)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(3).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    attrs4 = {"target_position": jnp.zeros((4,), jnp.float32)}
    attrs2 = {"target_position": jnp.zeros((2,), jnp.float32)}

    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"], attrs4)
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"], attrs2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(new2.key), np.asarray(new4.key)[:2]
    )


def test_batched_neural_kernel_matches_xla_reference():
    """Columns-mode NEURAL kernel (B sessions, one launch) == per-session
    XLA reference (scan rollout + trajectory cost + correction + softmax)
    with the same injected inducing-point noise."""
    from test_pallas_neural import make_neural_mppi

    B, K, H, tile = 4, 128, 10, 128
    ctrl = make_neural_mppi(K, H, net="mlp-16")
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
    assert u_nom_new.shape == (B, H, U) and costs.shape == (B, K)

    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)       # [H, U]
        delta = np.asarray(opt.interp.interpolate(delta_b[b]))   # [K, H, U]
        Q = np.clip(un_shift[None] + delta, -1.0, 1.0)
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
                0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                + opt.R * Q * delta + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        ref_cost = np.asarray(base) + corr
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=2e-4, rtol=2e-4
        )
        rho = ref_cost.min()
        w = np.exp(-(ref_cost - rho) / opt.LBD)
        upd = np.einsum("k,khu->hu", w, delta) / w.sum()
        ref_unom = np.clip(un_shift + upd, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(u_nom_new)[b], ref_unom, atol=1e-5, rtol=1e-5
        )


@pytest.mark.parametrize("spec", ["GRU-5IN-8H1-4OUT", "LSTM-5IN-8H1-4OUT"])
def test_batched_recurrent_kernel_matches_xla_reference(spec):
    """Columns-mode RECURRENT kernel (per-session live hidden riding the
    lane columns) == per-session XLA reference (recurrent scan rollout
    with that session's hidden + trajectory cost + correction + softmax)
    with the same injected inducing-point noise."""
    from test_pallas_neural import make_neural_mppi

    B, K, H, tile = 2, 64, 8, 128
    ctrl = make_neural_mppi(K, H, net=spec)
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    assert pred.recurrent
    _, update_from_eps = opt._make_batched_recurrent_step(
        B, interpret=True, tile_k=tile
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points

    states = make_states(opt, B)
    rng = np.random.default_rng(23)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    # Distinct per-session live hidden (the whole point of the columns
    # recurrent form).
    hidden = tuple(
        jnp.asarray(rng.normal(0, 0.3, size=(B, 1) + np.asarray(h).shape[1:]),
                    jnp.float32)
        for h in pred.hidden
    )
    delta_b = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(B, K, P, U)), jnp.float32
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, params["dyn"], params["cost"], attrs, hidden, delta_b
    )
    assert u_nom_new.shape == (B, opt.mpc_horizon, U) and costs.shape == (B, K)

    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)
        delta = np.asarray(opt.interp.interpolate(delta_b[b]))
        Q = np.clip(un_shift[None] + delta, -1.0, 1.0)
        d_b = dict(params["dyn"])
        d_b["hidden"] = tuple(h[b] for h in hidden)
        s_tiled = jnp.tile(s_b[b], (K, 1))
        traj = opt.predictor.rollout(s_tiled, jnp.asarray(Q), d_b)
        cparams = {
            "cost": params["cost"],
            "attrs": {"target_position": attrs["target_position"][b]},
        }
        base = opt.cost_function.get_trajectory_cost(
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
        rho = ref_cost.min()
        w = np.exp(-(ref_cost - rho) / opt.LBD)
        upd = np.einsum("k,khu->hu", w, delta) / w.sum()
        ref_unom = np.clip(un_shift + upd, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(u_nom_new)[b], ref_unom, atol=1e-5, rtol=1e-5
        )


@pytest.mark.slow
def test_batched_recurrent_step_independent_of_batch_size():
    from test_pallas_neural import make_neural_mppi

    K, H, tile = 64, 8, 128
    ctrl = make_neural_mppi(K, H, net="GRU-5IN-8H1-4OUT")
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    step4, _ = opt._make_batched_recurrent_step(4, interpret=True, tile_k=tile)
    step2, _ = opt._make_batched_recurrent_step(2, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states4 = make_states(opt, 4)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    rng = np.random.default_rng(29)
    h4 = tuple(
        jnp.asarray(rng.normal(0, 0.3, size=(4, 1) + np.asarray(h).shape[1:]),
                    jnp.float32)
        for h in pred.hidden
    )
    h2 = tuple(h[:2] for h in h4)
    s4 = jnp.asarray(rng.uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32)
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((4,), jnp.float32)}, h4)
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((2,), jnp.float32)}, h2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)


@pytest.mark.slow
def test_batched_neural_step_independent_of_batch_size():
    from test_pallas_neural import make_neural_mppi

    K, H, tile = 128, 10, 128
    ctrl = make_neural_mppi(K, H, net="mlp-16")
    opt = ctrl.optimizer
    step4, _ = opt._make_batched_neural_step(4, interpret=True, tile_k=tile)
    step2, _ = opt._make_batched_neural_step(2, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states4 = make_states(opt, 4)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(3).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((4,), jnp.float32)})
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((2,), jnp.float32)})
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)


def test_kernel_sweep_matches_eager_kernel_loop():
    """ClosedLoop._build_kernel_sweep (one scan program, one columnwise
    launch per tick) == an eager per-tick loop over the SAME batched
    kernel step + stage cost + plant advance."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 4, 64, 10, 128, 6
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.05, noise_seed=9)
    assert not loop._kernel_sweep_eligible(N)  # CPU backend -> vmap path
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = make_states(opt, N)
    rng = np.random.default_rng(11)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(42)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)

    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    # Eager reference over the same kstep instance semantics.
    kstep, _ = opt._make_batched_semi_fused_step(N, interpret=True, tile_k=tile)
    cf = ctrl.cost_function.cost_function
    s, u_prev, st = s0s, jnp.zeros((N, 1), jnp.float32), states0
    ref_ss, ref_us, ref_stage = [], [], []
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u_app = u + 0.05 * jax.vmap(
            lambda k: jax.random.normal(k, (1,)))(noise_keys[:, t])
        u_app = jnp.clip(u_app, -1.0, 1.0)
        ref_stage.append(cf.stage_cost_step(
            s, u_app, u_prev, {"cost": params["cost"],
                               "attrs": params["attrs"]}))
        ref_ss.append(s)
        ref_us.append(u_app)
        s = env.step_dynamics(s, u_app, env.dt)
        u_prev = u_app
    np.testing.assert_allclose(
        np.asarray(ss), np.stack([np.asarray(x) for x in ref_ss], 1),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(us), np.stack([np.asarray(x) for x in ref_us], 1),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stage), np.stack([np.asarray(x) for x in ref_stage], 1),
        atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)


def test_kernel_sweep_neural_dispatch_and_parity():
    """Monte-Carlo sweep over a LEARNED (MLP) predictor rolling against
    the true ODE plant: _build_kernel_sweep dispatches to the neural
    batched step and matches the eager per-tick loop over the same step."""
    from test_pallas_neural import make_neural_mppi

    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 64, 8, 128, 4
    ctrl = make_neural_mppi(K, H, net="mlp-16")
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = make_states(opt, N)
    rng = np.random.default_rng(2)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(8)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep, _ = opt._make_batched_neural_step(N, interpret=True, tile_k=tile)
    s, st = s0s, states0
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u = jnp.clip(u, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(us)[:, t], np.asarray(u),
                                   atol=1e-5, rtol=1e-5)
        s = env.step_dynamics(s, u, env.dt)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)


def make_cem_ctrl(K=64, H=10, **over):
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cem_outer_it": 2, "cem_best_k": 8, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "warmup": False,
    }
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "cem", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="cem", optimizer_config=cfg)
    return ctrl


def make_cem_states(opt, B, key_seed=0):
    from control_toolkit_tpu.optimizers.cem import CEMState

    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(key_seed), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(6)
    mue = jnp.asarray(
        rng.uniform(-0.3, 0.3, size=np.asarray(states.dist_mue).shape),
        jnp.float32,
    )
    u_prev = jnp.asarray(
        rng.uniform(-0.5, 0.5, size=np.asarray(states.u_prev).shape),
        jnp.float32,
    )
    return CEMState(key=states.key, dist_mue=mue, stdev=states.stdev,
                    count=states.count, u_prev=u_prev)


def test_batched_cem_refit_matches_xla_reference():
    """Columns-mode CEM evaluate+refit (B sessions, one cost-kernel launch)
    == per-session XLA reference (scan rollout + trajectory cost + top-k
    elite refit) with the same injected population."""
    from control_toolkit_tpu.ops.common import elite_indices

    B, K, H, tile = 4, 64, 10, 128
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    _, refit_from_Q = opt._make_batched_cem_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs

    states = make_cem_states(opt, B)
    rng = np.random.default_rng(21)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    Q_b = jnp.asarray(
        np.clip(rng.normal(0.0, 0.4, size=(B, K, H, U)), -1.0, 1.0), jnp.float32
    )

    mue, std, e0, costs = refit_from_Q(
        states, s_b, params["dyn"], params["cost"], attrs, Q_b
    )
    assert mue.shape == (B, 1, H, U) and costs.shape == (B, K)

    for b in range(B):
        s_tiled = jnp.tile(s_b[b], (K, 1))
        traj = opt.predictor.rollout(s_tiled, Q_b[b], params["dyn"])
        cparams = {
            "cost": params["cost"],
            "attrs": {"target_position": attrs["target_position"][b]},
        }
        ref_cost = np.asarray(opt.cost_function.get_trajectory_cost(
            traj, Q_b[b], states.u_prev[b], cparams
        ))
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=2e-4, rtol=2e-4
        )
        idx = np.asarray(elite_indices(jnp.asarray(ref_cost), opt.cem_best_k))
        elite = np.asarray(Q_b)[b][idx]
        np.testing.assert_allclose(
            np.asarray(mue)[b, 0], elite.mean(axis=0), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(std)[b, 0], elite.std(axis=0), atol=1e-5, rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(e0)[b], elite[0], atol=1e-6
        )


def test_batched_cem_step_matches_single_session():
    """Full batched CEM step == the single-session step_fn run per session:
    the batched step draws each session's population from ITS key with the
    same split/shape as the single-session path, so the whole iteration
    (sample -> evaluate -> refit -> shift) agrees to kernel-vs-scan float
    tolerance."""
    B, K, H, tile = 2, 64, 10, 128
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    kstep, _ = opt._make_batched_cem_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = make_cem_states(opt, B)
    rng = np.random.default_rng(13)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.4, 0.4, B), jnp.float32)

    u, new_states, costs = kstep(
        states, s_b, params["dyn"], params["cost"],
        {"target_position": attrs_vec},
    )

    step_fn = opt._make_step_fn()
    for b in range(B):
        st_b = jax.tree_util.tree_map(lambda x: x[b], states)
        p_b = {
            "dyn": params["dyn"], "cost": params["cost"],
            "attrs": {"target_position": attrs_vec[b]},
        }
        u_ref, new_ref, diag = step_fn(st_b, s_b[b], p_b)
        np.testing.assert_allclose(
            np.asarray(u)[b], np.asarray(u_ref), atol=2e-4, rtol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_states.dist_mue)[b], np.asarray(new_ref.dist_mue),
            atol=2e-4, rtol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(new_states.stdev)[b], np.asarray(new_ref.stdev),
            atol=2e-4, rtol=2e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(new_states.key)[b], np.asarray(new_ref.key)
        )
        np.testing.assert_allclose(
            np.asarray(costs)[b], np.asarray(diag["J_logged"]),
            atol=2e-4, rtol=2e-4,
        )


@pytest.mark.slow
def test_batched_cem_independent_of_batch_size():
    K, H, tile = 64, 10, 128
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    step4, _ = opt._make_batched_cem_step(4, interpret=True, tile_k=tile)
    step2, _ = opt._make_batched_cem_step(2, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states4 = make_cem_states(opt, 4)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(4).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((4,), jnp.float32)})
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((2,), jnp.float32)})
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)


@pytest.mark.slow
def test_kernel_sweep_cem_dispatch_and_parity():
    """Monte-Carlo sweep over a CEM controller: _build_kernel_sweep
    dispatches to the batched CEM step and matches the eager per-tick loop
    over the same step."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 64, 8, 128, 4
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    assert not loop._kernel_sweep_eligible(N)   # CPU backend -> vmap path
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = make_cem_states(opt, N)
    rng = np.random.default_rng(9)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(15)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep, _ = opt._make_batched_cem_step(N, interpret=True, tile_k=tile)
    s, st = s0s, states0
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u = jnp.clip(u, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(us)[:, t], np.asarray(u),
                                   atol=1e-5, rtol=1e-5)
        s = env.step_dynamics(s, u, env.dt)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)


def test_batched_cem_gates():
    """Batched CEM serving keeps the vmapped path (the columnwise CEM
    kernel measured neutral-to-worse — docs/KERNELS.md); warmup is
    rejected by the explicit batched builder (shared trip count)."""
    import pytest

    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "cem", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="cem", optimizer_config={
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": 10, "num_rollouts": 64,
        "cem_outer_it": 2, "cem_best_k": 8, "warmup": False,
    }, num_slots=4)
    assert not ctrl._kernel_path

    opt = make_cem_ctrl(64, 10, warmup=True).optimizer
    with pytest.raises(NotImplementedError):
        opt._make_batched_cem_step(2, interpret=True, tile_k=128)


def make_rpgd_ctrl(K=32, H=10, name="rpgd-tf", **over):
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "outer_its": 2, "learning_rate": 0.05, "opt_keep_k_ratio": 0.25,
        "resamp_per": 2, "period_interpolation_inducing_points": 5,
        "SAMPLING_DISTRIBUTION": "uniform", "warmup": False,
    }
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": name, "controller_logging": False},
    )
    ctrl.configure(optimizer_name=name, optimizer_config=cfg)
    return ctrl


def _rpgd_states(opt, B, key_seed=0):
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(key_seed), i) for i in range(B)]
    )
    return jax.vmap(opt._init_state)(keys)


@pytest.mark.slow  # default-tier representative: test_kernel_sweep_rpgd_dispatch_and_parity
@pytest.mark.parametrize("name", ["rpgd-tf", "rpgd-particle-tf"])
def test_batched_rpgd_step_matches_single_session(name):
    """Full batched RPGD step (columns-mode gradient+cost kernels, one
    launch per Adam iteration) == the single-session step_fn run per
    session (XLA-AD scan path on CPU), through BOTH surgery branches:
    step 1 hits the resample tick (count=0), step 2 the keep branch."""
    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_rpgd_ctrl(K, H, name=name)
    opt = ctrl.optimizer
    kstep = opt._make_batched_rpgd_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states = _rpgd_states(opt, B)
    rng = np.random.default_rng(19)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):       # tick 0 resamples (count%2==0), tick 1 keeps
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
            np.testing.assert_allclose(
                np.asarray(new_states.adam.m)[b], np.asarray(new_ref.adam.m),
                atol=5e-4, rtol=5e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(new_states.trajectory_ages)[b],
                np.asarray(new_ref.trajectory_ages),
            )
            np.testing.assert_array_equal(
                np.asarray(new_states.key)[b], np.asarray(new_ref.key)
            )
        states = new_states


@pytest.mark.slow
def test_batched_rpgd_independent_of_batch_size():
    K, H, tile = 32, 10, 64
    ctrl = make_rpgd_ctrl(K, H)
    opt = ctrl.optimizer
    step4 = opt._make_batched_rpgd_step(4, interpret=True, tile_k=32)
    step2 = opt._make_batched_rpgd_step(2, interpret=True, tile_k=32)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states4 = _rpgd_states(opt, 4)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(8).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((4,), jnp.float32)})
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((2,), jnp.float32)})
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new2.Q), np.asarray(new4.Q)[:2], atol=1e-6
    )


def test_kernel_sweep_rpgd_dispatch_and_parity():
    """Monte-Carlo sweep over an RPGD controller: _build_kernel_sweep
    dispatches to the batched RPGD step and matches the eager per-tick
    loop over the same step."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 32, 8, 32, 3
    ctrl = make_rpgd_ctrl(K, H)
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    assert not loop._kernel_sweep_eligible(N)   # CPU backend -> vmap path
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = _rpgd_states(opt, N)
    rng = np.random.default_rng(5)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(23)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep = opt._make_batched_rpgd_step(N, interpret=True, tile_k=tile)
    s, st = s0s, states0
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u = jnp.clip(u, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(us)[:, t], np.asarray(u),
                                   atol=1e-5, rtol=1e-5)
        s = env.step_dynamics(s, u, env.dt)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)


def test_batched_rpgd_gates():
    """CPU backend keeps the vmapped path; warmup is rejected by the
    batched builder."""
    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="rpgd-tf", optimizer_config={
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 10, "num_rollouts": 32,
        "outer_its": 2, "warmup": False,
    }, num_slots=4)
    assert not ctrl._batched_rpgd_eligible()    # CPU backend
    assert not ctrl._kernel_path

    opt = make_rpgd_ctrl(32, 10, warmup=True).optimizer
    with pytest.raises(NotImplementedError):
        opt._make_batched_rpgd_step(2, interpret=True, tile_k=32)


def make_var_ctrl(K=64, H=10, **over):
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cc_weight": 1.0, "R": 1.0, "LBD_mc": 100.0, "NU_mc": 1000.0,
        "SQRTRHOINV_mc": 0.05, "period_interpolation_inducing_points": 5,
        "LR": 0.0, "STDEV_min": 0.001, "STDEV_max": 10.0,
    }
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi-var-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi-var-tf", optimizer_config=cfg)
    return ctrl


def test_batched_var_lr0_equals_batched_mppi():
    """mppi-var with LR=0 through the batched columnwise path must be
    BITWISE the batched MPPI step (same keys, sigma frozen at the base
    stdev) — the batched analogue of the single-session LR=0 reduction."""
    from control_toolkit_tpu.optimizers.mppi_var import MPPIVarState

    B, K, H, tile = 4, 64, 10, 128
    mppi = make_mppi_ctrl(K, H).optimizer       # LBD=100 NU=1000 RHO=0.05 P=5
    var = make_var_ctrl(K, H).optimizer
    step_m, _ = mppi._make_batched_semi_fused_step(B, interpret=True,
                                                   tile_k=tile)
    step_v = var._make_batched_var_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        make_mppi_ctrl(K, H)._assemble_params(),
    )
    states_m = make_states(mppi, B)
    states_v = MPPIVarState(
        key=states_m.key, u_nom=states_m.u_nom, u_prev=states_m.u_prev,
        stdev=jnp.full((B, 1), mppi.SQRTRHODTINV, jnp.float32),
    )
    s = jnp.asarray(
        np.random.default_rng(5).uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32
    )
    attrs = {"target_position": jnp.zeros((B,), jnp.float32)}
    u_m, new_m, c_m = step_m(states_m, s, params["dyn"], params["cost"], attrs)
    u_v, new_v, c_v = step_v(states_v, s, params["dyn"], params["cost"], attrs)
    np.testing.assert_array_equal(np.asarray(u_v), np.asarray(u_m))
    np.testing.assert_array_equal(np.asarray(c_v), np.asarray(c_m))
    np.testing.assert_array_equal(np.asarray(new_v.u_nom), np.asarray(new_m.u_nom))
    # sigma frozen at LR=0
    np.testing.assert_array_equal(
        np.asarray(new_v.stdev), np.asarray(states_v.stdev)
    )


@pytest.mark.slow
def test_batched_var_adaptation_independent_of_batch_size():
    from control_toolkit_tpu.optimizers.mppi_var import MPPIVarState

    K, H, tile = 64, 10, 128
    var = make_var_ctrl(K, H, LR=1000.0).optimizer
    step4 = var._make_batched_var_step(4, interpret=True, tile_k=tile)
    step2 = var._make_batched_var_step(2, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32),
        make_var_ctrl(K, H)._assemble_params(),
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(2), i) for i in range(4)]
    )
    states4 = jax.vmap(var._init_state)(keys)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(7).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    a4 = {"target_position": jnp.zeros((4,), jnp.float32)}
    a2 = {"target_position": jnp.zeros((2,), jnp.float32)}
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"], a4)
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"], a2)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new2.stdev), np.asarray(new4.stdev)[:2], atol=1e-6
    )
    # Adaptation moved sigma (LR big) and respected the bounds.
    assert not np.allclose(np.asarray(new4.stdev), np.asarray(states4.stdev))
    assert np.all(np.asarray(new4.stdev) >= var.STDEV_min)
    assert np.all(np.asarray(new4.stdev) <= var.STDEV_max)
    assert isinstance(new4, MPPIVarState)


def make_gradient_ctrl(K=32, H=10, **over):
    from control_toolkit_tpu.controllers.mpc import MPCController

    cfg = {
        "seed": 9, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "gradient_steps": 2, "learning_rate": 0.05, "gradmax_clip": 5.0,
        "warmup": False,
    }
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "gradient-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="gradient-tf", optimizer_config=cfg)
    return ctrl


@pytest.mark.slow
def test_batched_gradient_step_matches_single_session():
    """Batched gradient-tf (columns-mode gradient+cost kernels) == the
    single-session step_fn per session (XLA-AD scan on CPU), including the
    warm-start shift with per-session fresh random tails."""
    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_gradient_ctrl(K, H)
    opt = ctrl.optimizer
    kstep = opt._make_batched_gradient_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(31)
    s_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, 1, 4)), jnp.float32)
    attrs_vec = jnp.asarray(np.linspace(-0.3, 0.3, B), jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):
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
            np.testing.assert_allclose(
                np.asarray(new_states.adam.m)[b], np.asarray(new_ref.adam.m),
                atol=5e-4, rtol=5e-4,
            )
            np.testing.assert_array_equal(
                np.asarray(new_states.key)[b], np.asarray(new_ref.key)
            )
        states = new_states


def test_kernel_sweep_gradient_dispatch_and_unsupported_error():
    """_build_kernel_sweep dispatches gradient-tf to the batched gradient
    step, and raises a clear NotImplementedError (not an AttributeError)
    for optimizers with no columnwise step."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 32, 8, 32, 3
    ctrl = make_gradient_ctrl(K, H)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(N)]
    )
    states0 = jax.vmap(opt._init_state)(keys)
    s0s = jnp.zeros((N, 4), jnp.float32).at[:, 2].set(0.2)
    sub = jax.random.PRNGKey(1)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)
    assert np.all(np.isfinite(np.asarray(sT)))

    from control_toolkit_tpu.controllers.mpc import MPCController

    ilqr = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "ilqr", "controller_logging": False},
    )
    ilqr.configure(optimizer_name="ilqr", optimizer_config={
        "seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 10,
        "max_iterations": 3,
    })
    loop2 = ClosedLoop(ilqr, env, actuator_noise=0.0)
    assert loop2._sweep_kernel_kind(N) is None
    with pytest.raises(NotImplementedError):
        loop2._build_kernel_sweep(N, interpret=True, tile_k=tile)


def test_batched_gradient_gates():
    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "gradient-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="gradient-tf", optimizer_config={
        "seed": 9, "mpc_timestep": 0.02, "mpc_horizon": 10, "num_rollouts": 32,
        "gradient_steps": 2, "warmup": False,
    }, num_slots=4)
    assert not ctrl._batched_gradient_eligible()    # CPU backend
    assert not ctrl._kernel_path

    opt = make_gradient_ctrl(32, 10, warmup=True).optimizer
    with pytest.raises(NotImplementedError):
        opt._make_batched_gradient_step(2, interpret=True, tile_k=32)


def test_batched_kernel_eligibility_gate():
    """On CPU the controller must stay on the vmapped scan path; the
    divisibility rules reject non-tileable shapes."""
    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        optimizer_config={"seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 8,
                          "num_rollouts": 64, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 4},
        num_slots=4,
    )
    assert ctrl._kernel_path is False  # CPU backend
    s = np.tile(np.array([0.0, 0.0, 0.2, 0.0], np.float32), (4, 1))
    u = ctrl.step_batch(s)
    assert np.all(np.isfinite(u))


def test_batched_gp_kernel_matches_xla_reference(tmp_path):
    """Columns-mode sparse-GP kernel (B sessions, one launch) == per-session
    XLA reference (GP scan rollout + trajectory cost + correction + softmax)
    with the same injected inducing-point noise."""
    from test_pallas_gp import make_gp_mppi
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.models.gp_predictor import (
        GPPredictor, fit_gp_dynamics)
    from control_toolkit_tpu.models.training import collect_transitions

    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env, 150, seed=0)
    gparams, _ = fit_gp_dynamics(x, u, xn, num_inducing=64, seed=0)
    path = tmp_path / "sgp.npz"
    GPPredictor("cartpole", dt=0.02, params=gparams).save(path)

    B, K, H, tile = 4, 128, 10, 128
    ctrl = make_gp_mppi(str(path), K, H)
    opt = ctrl.optimizer
    _, update_from_eps = opt._make_batched_gp_step(B, interpret=True,
                                                   tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points

    states = make_states(opt, B)
    rng = np.random.default_rng(31)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    delta_b = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(B, K, P, U)), jnp.float32
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, params["dyn"], params["cost"], attrs, delta_b
    )
    assert u_nom_new.shape == (B, H, U) and costs.shape == (B, K)

    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)       # [H, U]
        delta = np.asarray(opt.interp.interpolate(delta_b[b]))   # [K, H, U]
        Q = np.clip(un_shift[None] + delta, -1.0, 1.0)
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
                0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                + opt.R * Q * delta + 0.5 * opt.R * Q**2
            ), axis=(1, 2),
        )
        ref_cost = np.asarray(base) + corr
        # same reassociation tolerance story as test_pallas_gp
        np.testing.assert_allclose(
            np.asarray(costs)[b], ref_cost, atol=2e-4, rtol=1e-3
        )
        rho = ref_cost.min()
        w = np.exp(-(ref_cost - rho) / opt.LBD)
        upd = np.einsum("k,khu->hu", w, delta) / w.sum()
        ref_unom = np.clip(un_shift + upd, -1.0, 1.0)
        np.testing.assert_allclose(
            np.asarray(u_nom_new)[b], ref_unom, atol=1e-5, rtol=1e-4
        )


def test_kernel_sweep_gp_dispatch_and_parity(tmp_path):
    """Monte-Carlo sweep over a sparse-GP predictor rolling against the
    true ODE plant: _build_kernel_sweep dispatches to the batched GP step
    and matches the eager per-tick loop over the same step."""
    from test_pallas_gp import make_gp_mppi
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop
    from control_toolkit_tpu.models.gp_predictor import (
        GPPredictor, fit_gp_dynamics)
    from control_toolkit_tpu.models.training import collect_transitions

    env0 = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env0, 150, seed=0)
    gparams, _ = fit_gp_dynamics(x, u, xn, num_inducing=64, seed=0)
    path = tmp_path / "sgp.npz"
    GPPredictor("cartpole", dt=0.02, params=gparams).save(path)

    N, K, H, tile, T = 2, 64, 8, 128, 4
    ctrl = make_gp_mppi(str(path), K, H)
    opt = ctrl.optimizer
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    states0 = make_states(opt, N)
    rng = np.random.default_rng(2)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(8)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep, _ = opt._make_batched_gp_step(N, interpret=True, tile_k=tile)
    s, st = s0s, states0
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], params["dyn"], params["cost"],
                         params["attrs"])
        u = jnp.clip(u, -1.0, 1.0)
        np.testing.assert_allclose(np.asarray(us)[:, t], np.asarray(u),
                                   atol=1e-5, rtol=1e-5)
        s = env.step_dynamics(s, u, env.dt)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)
