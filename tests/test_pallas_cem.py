"""Fully-fused CEM kernel (interpret mode): exact noise regeneration,
cost agreement with the scan path, and closed-loop behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.ops.pallas_mppi import ROWS


def make_cem_ctrl(K=256, H=20, logging=False, fully_fused=False,
                  predictor_spec="ODE"):
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.1},
        config={"optimizer": "cem-tf", "controller_logging": logging},
    )
    ctrl.configure(optimizer_name="cem-tf",
                   predictor_specification=predictor_spec,
                   optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "cem_outer_it": 2, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 32,
        "warmup": False, "warmup_iterations": 2, "fully_fused": fully_fused,
    })
    return ctrl


@pytest.mark.parametrize("spec", ["ODE", "ODE:rk4:1:fast"])
def test_fused_cem_costs_match_regenerated_controls(spec):
    """Kernel costs must equal the scan-path costs of the controls
    regenerated in XLA from the SAME noise counters (the regeneration is
    bit-exact, the rollout math agrees to float tolerance) — in both the
    exact and the fast-sampling (polynomial log/cos Box-Muller) modes."""
    K, H, tile = 256, 20, 128
    ctrl = make_cem_ctrl(K, H, predictor_spec=spec)
    opt = ctrl.optimizer
    run, regen, pack = opt._build_fused_cem(interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    s0 = jnp.array([0.1, -0.05, 0.25, 0.1], jnp.float32)
    mue = 0.1 * jnp.ones((H, 1), jnp.float32)
    std = 0.4 * jnp.ones((H, 1), jnp.float32)
    u_prev = jnp.array([0.2], jnp.float32)
    seed2 = jnp.array([77, 0], jnp.int32)

    costs2d = run(s0, mue, std, pack(params, u_prev), seed2)
    cost_kernel = np.asarray(costs2d).reshape(-1)

    # Regenerate ALL rows and score through the fused-scan reference.
    Q_all = regen(seed2, jnp.arange(K), mue, std, K)       # [K, H, U]
    s_tiled = jnp.tile(s0[None], (K, 1))
    cost_ref = np.asarray(opt._fused_cost(s_tiled, Q_all, u_prev, params))
    np.testing.assert_allclose(cost_kernel, cost_ref, rtol=3e-5, atol=1e-4)

    # Elite regeneration is a bit-exact subset of the full regeneration.
    idx = jnp.asarray(np.argsort(cost_kernel)[:32])
    elite_Q = regen(seed2, idx, mue, std, K)
    np.testing.assert_array_equal(
        np.asarray(elite_Q), np.asarray(Q_all)[np.asarray(idx)]
    )


def test_fused_cem_seed_determinism_and_bounds():
    K, H, tile = 128, 10, 64
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    run, regen, pack = opt._build_fused_cem(interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    s0 = jnp.zeros(4, jnp.float32)
    mue = jnp.zeros((H, 1), jnp.float32)
    std = 2.0 * jnp.ones((H, 1), jnp.float32)  # heavy clipping
    pv = pack(params, jnp.zeros(1))
    c1 = run(s0, mue, std, pv, jnp.array([5, 0], jnp.int32))
    c2 = run(s0, mue, std, pv, jnp.array([5, 0], jnp.int32))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    c3 = run(s0, mue, std, pv, jnp.array([6, 0], jnp.int32))
    assert not np.array_equal(np.asarray(c1), np.asarray(c3))
    # regenerated controls respect the box under heavy clipping
    Q = np.asarray(regen(jnp.array([5, 0], jnp.int32), jnp.arange(K), mue, std, K))
    assert Q.min() >= -1.0 and Q.max() <= 1.0
    assert (Q == -1.0).any() and (Q == 1.0).any()


def make_strong_cem(fully_fused):
    """CEM at the reference's full default budget (vanilla CEM is the
    weakest baseline — see test_optimizer_zoo)."""
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "cem-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="cem-tf", optimizer_config={
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 35, "num_rollouts": 192,
        "cem_outer_it": 3, "cem_initial_action_stdev": 0.5,
        "cem_stdev_min": 0.01, "cem_best_k": 40,
        "warmup": False, "warmup_iterations": 2, "fully_fused": fully_fused,
    })
    return ctrl


def test_fused_cem_closed_loop_stabilizes():
    """Full fused CEM optimizer step (interpret kernels) stabilizes in
    closed loop at the same budget where the plain path does."""
    for fused in (False, True):
        ctrl = make_strong_cem(fused)
        if fused:
            opt = ctrl.optimizer
            opt._can_fully_fuse = lambda: True
            orig_build = opt._build_fused_cem
            opt._build_fused_cem = lambda: orig_build(interpret=True, tile_k=64)
            opt._build()
        env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
        s, _ = env.reset()
        for _ in range(60):
            u = ctrl.step(s[0])
            s, *_ = env.step(u)
        assert abs(float(s[0, 2])) < 0.45, (
            f"CEM (fused={fused}) failed to stabilize: {s[0]}"
        )


# ------------------------------------------------- columns (batched) mode
def test_batched_fused_cem_costs_match_regenerated_controls():
    """Columns-mode fused CEM kernel (B sessions, one launch): kernel
    costs == scan-path costs of the per-session populations regenerated
    in XLA from the SAME session-local counters."""
    from control_toolkit_tpu.ops.pallas_cem import build_fused_cem_cols

    B, K, H, tile = 2, 128, 10, 128
    ROWS_ = ROWS
    cps, C = K // ROWS_, tile // ROWS_
    T = (B * K) // tile
    ctrl = make_cem_ctrl(K, H)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    param_keys, _, derivs, stage_soa, terminal_soa, pred = opt._soa_bindings()
    slot_keys = [k for k in param_keys if k.startswith(("a_", "__u_prev_"))]
    make_run_cols, regen_cols = build_fused_cem_cols(
        derivs, stage_soa, terminal_soa,
        num_states=4, num_controls=1, horizon=H,
        param_keys=param_keys, slot_keys=slot_keys,
        action_low=opt.action_low, action_high=opt.action_high,
        k_per_session=K, integrator=pred.integrator,
        intermediate_steps=pred.intermediate_steps,
        tile_k=tile, interpret=True,
    )
    run = make_run_cols(B * K, pred.dt)

    rng = np.random.default_rng(3)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 4)), jnp.float32)
    mue_b = jnp.asarray(rng.uniform(-0.2, 0.2, size=(B, H, 1)), jnp.float32)
    std_b = jnp.full((B, H, 1), 0.4, jnp.float32)
    u_prev_b = jnp.asarray(rng.uniform(-0.5, 0.5, size=(B, 1)), jnp.float32)
    targets = jnp.asarray(np.linspace(-0.4, 0.4, B), jnp.float32)
    seed_b = jnp.asarray([1234, 98765], jnp.int32)

    def expand_cols(vals):
        n = vals.shape[1]
        cols = jnp.repeat(vals, cps, axis=0)
        return cols.reshape(T, C, n).transpose(0, 2, 1)

    shared_keys = [k for k in param_keys if k not in slot_keys]
    pvec = jnp.stack([
        jnp.asarray(
            params["dyn"][k[2:]] if k.startswith("d_")
            else params["cost"][k[2:]], jnp.float32,
        ) for k in shared_keys
    ])
    rows = []
    for k in slot_keys:
        if k == "a_target_position":
            rows.append(targets)
        else:
            rows.append(u_prev_b[:, int(k.rsplit("_", 1)[1])])
    pslot_cols = expand_cols(jnp.stack(rows, axis=1))
    seedcw = jnp.stack(
        [jnp.repeat(seed_b, cps),
         jnp.tile(jnp.arange(cps, dtype=jnp.int32), B)], axis=1
    ).reshape(T, C, 2).transpose(0, 2, 1)

    costs2d = run(
        pvec, expand_cols(s_b),
        expand_cols(mue_b.reshape(B, H)), expand_cols(std_b.reshape(B, H)),
        pslot_cols, seedcw,
    )
    costs = np.asarray(
        costs2d.reshape(ROWS_, B, cps).transpose(1, 0, 2).reshape(B, K)
    )

    for b in range(B):
        Q_all = regen_cols(seed_b[b], jnp.arange(K), mue_b[b], std_b[b])
        s_tiled = jnp.tile(s_b[b][None], (K, 1))
        p_b = {
            "dyn": params["dyn"], "cost": params["cost"],
            "attrs": {"target_position": targets[b]},
        }
        ref = np.asarray(opt._fused_cost(s_tiled, Q_all, u_prev_b[b], p_b))
        np.testing.assert_allclose(costs[b], ref, rtol=3e-5, atol=1e-4)


def test_batched_fused_cem_step_independent_of_batch_size():
    from control_toolkit_tpu.optimizers.cem import CEMState

    K, H, tile = 128, 10, 128
    ctrl = make_cem_ctrl(K, H, fully_fused=True)
    opt = ctrl.optimizer
    step4 = opt._make_batched_fused_cem_step(4, interpret=True, tile_k=tile)
    step2 = opt._make_batched_fused_cem_step(2, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(1), i) for i in range(4)]
    )
    states4 = jax.vmap(opt._init_state)(keys)
    states2 = jax.tree_util.tree_map(lambda x: x[:2], states4)
    s4 = jnp.asarray(
        np.random.default_rng(6).uniform(-0.2, 0.2, size=(4, 1, 4)), jnp.float32
    )
    u4, new4, c4 = step4(states4, s4, params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((4,), jnp.float32)})
    u2, new2, c2 = step2(states2, s4[:2], params["dyn"], params["cost"],
                         {"target_position": jnp.zeros((2,), jnp.float32)})
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u4)[:2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c4)[:2], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new2.dist_mue), np.asarray(new4.dist_mue)[:2], atol=1e-6
    )
    assert isinstance(new2, CEMState)


def test_batched_fused_cem_gates():
    import pytest

    from control_toolkit_tpu.controllers.batched_mpc import BatchedMPCController

    def build(fully_fused):
        c = BatchedMPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "cem-tf", "controller_logging": False},
        )
        c.configure(optimizer_name="cem-tf", optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 10,
            "num_rollouts": 512, "cem_outer_it": 2, "cem_best_k": 32,
            "warmup": False, "fully_fused": fully_fused,
        }, num_slots=4)
        return c

    # CPU backend: never the kernel path, regardless of the flag.
    assert not build(True)._kernel_path
    assert not build(False)._kernel_path

    opt = make_cem_ctrl(128, 10, fully_fused=True)
    opt.optimizer.warmup = True
    with pytest.raises(NotImplementedError):
        opt.optimizer._make_batched_fused_cem_step(2, interpret=True,
                                                   tile_k=128)


def test_kernel_sweep_fused_cem_dispatch_and_parity():
    """Monte-Carlo sweep over a fully-fused CEM controller dispatches to
    the batched fused step and matches the eager per-tick loop over the
    same step."""
    from control_toolkit_tpu.evaluation import ClosedLoop

    N, K, H, tile, T = 2, 64, 8, 128, 3
    ctrl = make_cem_ctrl(K, H, fully_fused=True)
    ctrl.optimizer.cem_best_k = 16
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0)
    assert not loop._kernel_sweep_eligible(N)   # CPU backend -> vmap path
    opt = ctrl.optimizer
    sweep = loop._build_kernel_sweep(N, interpret=True, tile_k=tile)

    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(4), i) for i in range(N)]
    )
    states0 = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(12)
    s0s = jnp.asarray(rng.uniform(-0.2, 0.2, size=(N, 4)), jnp.float32)
    sub = jax.random.PRNGKey(31)
    noise_keys = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)
    _, sT, ss, us, stage, _ = sweep(states0, s0s, params, noise_keys, T)

    kstep = opt._make_batched_fused_cem_step(N, interpret=True, tile_k=tile)
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
