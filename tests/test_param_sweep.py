"""Per-episode parameter sweeps (ClosedLoop.run_batch sweep_params) and the
on-device grid_search tuner (evaluation/tuning.py).

The reference has no tuning tooling beyond the manual cost plotter
(Cost_Functions/cost_function_tester.py); here an N-point hyperparameter /
robustness grid is one vmapped device program.  Every swept quantity is
already a jit argument (cost weights, attrs, dynamics constants), so the
sweep only adds an episode axis to those leaves.
"""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.evaluation import ClosedLoop, grid_search

MPPI_CFG = {
    "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": 12, "num_rollouts": 64,
    "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
    "SQRTRHOINV": 0.05, "period_interpolation_inducing_points": 4,
}
S0 = np.array([0.0, 0.0, 0.15, 0.0], np.float32)


def _loop(target=0.0, noise_seed=7, **overrides):
    cfg = dict(MPPI_CFG, **overrides)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": float(target)},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", optimizer_config=cfg)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    return ClosedLoop(ctrl, env, actuator_noise=0.0, noise_seed=noise_seed)


@pytest.fixture(scope="module")
def shared_loop():
    """One ClosedLoop for every test that doesn't need a differently-
    configured controller: its jitted programs (and the per-path-set
    swept programs) compile once for the module.  Tests rewind the
    actuator-noise key for run-to-run determinism; run_batch never
    mutates controller state."""
    return _loop()


def _rewound(loop):
    import jax

    loop._noise_key = jax.random.PRNGKey(7)
    return loop


def test_constant_sweep_matches_unswept(shared_loop):
    """A sweep whose rows are all the base value == the unswept batch."""
    N, T = 4, 8
    s0s = np.tile(S0, (N, 1))
    base = _rewound(shared_loop).run_batch(s0s, T)
    swept = _rewound(shared_loop).run_batch(
        s0s, T,
        sweep_params={"attrs": {"target_position": np.zeros(N, np.float32)}},
    )
    np.testing.assert_allclose(
        swept["stage_costs"], base["stage_costs"], atol=1e-6, rtol=0)
    np.testing.assert_allclose(
        swept["final_states"], base["final_states"], atol=1e-6, rtol=0)


def test_swept_rows_match_per_config_batches(shared_loop):
    """Row j of a 3-target sweep == row j of an unswept batch whose
    controller was configured with target j (same episode PRNG streams —
    fold_in on the row index — and same noise seed)."""
    targets = np.array([0.0, 0.4, -0.3, 0.2], np.float32)
    N, T = len(targets), 8
    s0s = np.tile(S0, (N, 1))
    swept = _rewound(shared_loop).run_batch(
        s0s, T, sweep_params={"attrs": {"target_position": targets}},
        return_trajectories=True,
    )
    ref_loop = _loop()
    for j, tgt in enumerate(targets):
        ref_loop.controller.update_attributes({"target_position": tgt})
        ref = _rewound(ref_loop).run_batch(s0s, T, return_trajectories=True)
        np.testing.assert_allclose(
            swept["controls"][j], ref["controls"][j], atol=1e-5, rtol=0)
        np.testing.assert_allclose(
            swept["stage_costs"][j], ref["stage_costs"][j], atol=1e-4, rtol=0)


def test_dyn_constant_sweep_changes_rollouts(shared_loop):
    """Sweeping a controller-side dynamics constant (model-mismatch
    robustness: pole half-length L) flows through the predictor — rows
    with different L produce different control trajectories against the
    same fixed plant."""
    L = np.array([0.5, 1.5, 0.5, 0.5], np.float32)  # row 0 = true model
    N, T = len(L), 8
    s0s = np.tile(S0, (N, 1))
    out = _rewound(shared_loop).run_batch(
        s0s, T, sweep_params={"dyn": {"L": L}}, return_trajectories=True,
    )
    ref = _rewound(shared_loop).run_batch(s0s, T, return_trajectories=True)
    # Same episode index -> same PRNG stream: the true-model row matches
    # the unswept run bit-for-bit, the mismatched-L row diverges.
    np.testing.assert_allclose(
        out["controls"][0], ref["controls"][0], atol=1e-6, rtol=0)
    assert not np.allclose(out["controls"][1], ref["controls"][1], atol=1e-4)


def test_sweep_validation_errors(shared_loop):
    loop = shared_loop
    s0s = np.tile(S0, (3, 1))
    with pytest.raises(ValueError, match="sweep leaf 'attrs.target_position'"):
        loop.run_batch(s0s, 4, sweep_params={
            "attrs": {"target_position": np.zeros(2, np.float32)}})
    with pytest.raises(KeyError, match="no_such_key"):
        loop.run_batch(s0s, 4, sweep_params={
            "attrs": {"no_such_key": np.zeros(3, np.float32)}})
    with pytest.raises(ValueError, match="no leaves"):
        loop.run_batch(s0s, 4, sweep_params={"attrs": {}})


def test_swept_program_cache_reuse(shared_loop):
    """Same swept-leaf set -> one cached program; params values are
    dynamic arguments (no new program across value changes)."""
    s0s = np.tile(S0, (4, 1))
    shared_loop.run_batch(s0s, 8, sweep_params={
        "attrs": {"target_position": np.zeros(4, np.float32)}})
    before = len(shared_loop._swept_runs)
    shared_loop.run_batch(s0s, 8, sweep_params={
        "attrs": {"target_position": np.asarray([.2, -.2, .1, 0.], np.float32)}})
    assert len(shared_loop._swept_runs) == before


def test_mesh_swept_matches_unsharded(shared_loop):
    """Episode-axis sharding composes with parameter sweeps: swept leaves
    shard with the episodes, unswept params replicate."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    cpu_mesh_8 = make_rollout_mesh()
    N, T = 8, 6
    targets = np.linspace(-0.4, 0.4, N).astype(np.float32)
    s0s = np.tile(S0, (N, 1))
    sweep = {"attrs": {"target_position": targets}}
    ref = _rewound(shared_loop).run_batch(s0s, T, sweep_params=sweep)
    sharded = _rewound(shared_loop).run_batch(
        s0s, T, sweep_params=sweep, mesh=cpu_mesh_8)
    np.testing.assert_allclose(
        sharded["stage_costs"], ref["stage_costs"], atol=2e-5, rtol=0)


def test_grid_search_cross_product_and_best(shared_loop):
    """2x2 grid -> 4 configs in itertools.product order; the config whose
    target matches the plant's start position wins (no travel cost)."""
    loop = _rewound(shared_loop)
    res = grid_search(
        loop,
        grid={
            "attrs.target_position": np.array([0.0, 0.8], np.float32),
            "dyn.L": np.array([0.5, 1.0], np.float32),
        },
        s0=S0, ticks=8,
    )
    assert len(res["configs"]) == 4
    assert res["mean_costs"].shape == (4,)
    assert [c["attrs.target_position"] for c in res["configs"]] == [
        0.0, 0.0, 0.8, 0.8]
    assert [c["dyn.L"] for c in res["configs"]] == [0.5, 1.0, 0.5, 1.0]
    # Starting at the target with the true model must beat chasing a far
    # target: best config has target 0.
    assert res["best"]["attrs.target_position"] == 0.0
    assert res["best_cost"] == pytest.approx(
        res["mean_costs"][res["ranking"][0]])


def test_grid_search_fixed_scoring(shared_loop):
    """score='fixed' re-scores all trajectories under the BASE cost params
    — the yardstick for cost-weight tuning.  A config that zeroes its own
    stage weights would win under swept scoring; under fixed scoring it is
    judged by the common metric."""
    loop = _rewound(shared_loop)
    res = grid_search(
        loop,
        grid={"attrs.target_position": np.array([0.0, 0.6], np.float32)},
        s0=S0, ticks=8, episodes_per_config=2, score="fixed",
    )
    # Both configs are scored against the BASE target (0.0): the config
    # that actually drives toward 0 must win.
    assert res["best"]["attrs.target_position"] == 0.0
    # And fixed scoring differs from swept scoring for the off-target row.
    swept = grid_search(
        loop,
        grid={"attrs.target_position": np.array([0.0, 0.6], np.float32)},
        s0=S0, ticks=8, episodes_per_config=2, score="swept",
    )
    assert not np.allclose(res["mean_costs"][1], swept["mean_costs"][1])


def test_grid_search_input_validation(shared_loop):
    loop = shared_loop
    with pytest.raises(ValueError, match="grid is empty"):
        grid_search(loop, {}, S0, 4)
    with pytest.raises(ValueError, match="score must be"):
        grid_search(loop, {"dyn.L": np.array([0.5])}, S0, 4, score="x")
    with pytest.raises(ValueError, match="non-empty value array"):
        grid_search(loop, {"dyn.L": np.array(0.5)}, S0, 4)


def test_kernel_swept_program_matches_eager_kernel_loop():
    """The kernel-path SWEPT program (per-episode dyn constant + cost
    weight + attr riding pslot rows, interpret mode) == an eager per-tick
    loop over the same batched kernel step with the same per-episode
    params.  (The semi-fused kernel's tile-layout noise is statistically,
    not bitwise, equal to the modular draw — so the reference is the
    kernel step itself, as in test_kernel_sweep_matches_eager_kernel_loop.)
    """
    import jax
    import jax.numpy as jnp

    loop = _loop()
    opt = loop.optimizer
    env = loop.env
    N, T, tile = 4, 6, 128
    sweep = {
        "dyn": {"L": np.array([0.4, 0.5, 0.6, 0.7], np.float32)},
        "cost": {"ep_weight": np.array([5e3, 1e4, 4e4, 1e4], np.float32)},
        "attrs": {"target_position": np.array([0., .2, -.2, .1], np.float32)},
    }
    params = loop.controller._assemble_params()
    from control_toolkit_tpu.evaluation.closed_loop import _overlay_sweep

    merged, _, _ = _overlay_sweep(params, sweep, N)
    kern = loop._build_kernel_sweep(N, interpret=True, tile_k=tile,
                                    per_slot_dyn=("L",),
                                    per_slot_cost=("ep_weight",))

    ep_keys = jnp.stack(
        [jax.random.fold_in(opt._initial_key, i) for i in range(N)]
    )
    states0 = jax.vmap(opt._init_state)(ep_keys)
    s0s = jnp.tile(jnp.asarray(S0), (N, 1))
    sub = jax.random.PRNGKey(9)
    nk = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)

    _, sT, ss, us, stage, _ = kern(states0, s0s, merged, nk, T)

    kstep, _ = opt._make_batched_semi_fused_step(
        N, interpret=True, tile_k=tile,
        per_slot_dyn=("L",), per_slot_cost=("ep_weight",))
    cf = loop.controller.cost_function.cost_function
    s, u_prev, st = s0s, jnp.zeros((N, 1), jnp.float32), states0
    ref_us, ref_stage = [], []
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], merged["dyn"], merged["cost"],
                         merged["attrs"])
        ref_stage.append(cf.stage_cost_step(
            s, u, u_prev, {"cost": merged["cost"], "attrs": merged["attrs"]}))
        ref_us.append(u)
        s = env.step_dynamics(s, u, env.dt)
        u_prev = u
    np.testing.assert_allclose(
        np.asarray(us), np.stack([np.asarray(x) for x in ref_us], 1),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stage), np.stack([np.asarray(x) for x in ref_stage], 1),
        atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sT), np.asarray(s),
                               atol=1e-5, rtol=1e-5)
    # The swept values genuinely reach the kernel: every row plans with a
    # different (L, ep_weight, target) triple, so no two rows act alike.
    for a in range(N - 1):
        assert not np.allclose(np.asarray(us)[a], np.asarray(us)[a + 1],
                               atol=1e-5)


def test_swept_kernel_gate_classification():
    """_swept_kernel_run_for accepts only per-episode SCALAR attr/dyn/cost
    leaves (and only for the 'ode' sweep kind — always None on CPU, where
    the backend gate rejects the kernel)."""
    loop = _loop()
    params = loop.controller._assemble_params()
    from control_toolkit_tpu.evaluation.closed_loop import _overlay_sweep

    merged, _, paths = _overlay_sweep(
        params, {"dyn": {"L": np.zeros(4, np.float32) + 0.5}}, 4)
    # CPU backend: the 'ode' kernel kind is ineligible -> vmapped path.
    assert loop._swept_kernel_run_for(4, tuple(paths), merged) is None


@pytest.mark.slow
def test_grid_search_static_grid():
    """static_grid rebuilds the controller per optimizer-hyperparameter
    combination and crosses it with the swept grid; configs merge both
    key sets and static-only searches work with an empty swept grid."""
    def build(overrides):
        return _loop(**{k: float(v) for k, v in overrides.items()})

    res = grid_search(
        None,
        grid={"attrs.target_position": np.array([0.0, 0.4], np.float32)},
        s0=S0, ticks=8, episodes_per_config=2,
        static_grid={"LBD": np.array([10.0, 100.0], np.float32)},
        build_loop=build,
    )
    assert len(res["configs"]) == 4
    assert [c["LBD"] for c in res["configs"]] == [10.0, 10.0, 100.0, 100.0]
    assert [c["attrs.target_position"] for c in res["configs"]] == [
        0.0, 0.4, 0.0, 0.4]
    assert np.all(np.isfinite(res["mean_costs"]))
    # Static combo j's swept sub-table == a standalone grid_search on a
    # loop built with that LBD (same episode PRNG streams + noise seed).
    sub = grid_search(
        build({"LBD": 10.0}),
        grid={"attrs.target_position": np.array([0.0, 0.4], np.float32)},
        s0=S0, ticks=8, episodes_per_config=2,
    )
    np.testing.assert_allclose(res["mean_costs"][:2], sub["mean_costs"],
                               rtol=1e-6, atol=0)
    # Static-only search (empty swept grid).
    res2 = grid_search(
        None, grid={}, s0=S0, ticks=8, episodes_per_config=2,
        static_grid={"LBD": np.array([10.0, 100.0], np.float32)},
        build_loop=build,
    )
    assert len(res2["configs"]) == 2 and "LBD" in res2["configs"][0]
    with pytest.raises(ValueError, match="requires build_loop"):
        grid_search(None, {}, S0, 4,
                    static_grid={"LBD": np.array([1.0])})
    with pytest.raises(ValueError, match="only meaningful"):
        grid_search(None, {"dyn.L": np.array([0.5])}, S0, 4,
                    build_loop=build)


@pytest.mark.slow
def test_rpgd_kernel_swept_program_matches_eager_kernel_loop():
    """The RPGD kernel-path swept program (per-episode dyn constant + cost
    weight + attr as pslot rows through the fwd+bwd gradient kernel,
    interpret mode) == an eager per-tick loop over the same per-episode
    RPGD kernel step."""
    import jax
    import jax.numpy as jnp

    from test_pallas_batched import make_rpgd_ctrl

    N, T, tile = 2, 4, 64
    ctrl = make_rpgd_ctrl(32, 10)
    opt = ctrl.optimizer
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv
    from control_toolkit_tpu.evaluation import ClosedLoop

    env = CartpoleEnv(batch_size=1, dt=0.02, seed=0)
    loop = ClosedLoop(ctrl, env, actuator_noise=0.0, noise_seed=5)
    sweep = {
        "dyn": {"L": np.array([0.45, 0.7], np.float32)},
        "cost": {"ep_weight": np.array([5e3, 3e4], np.float32)},
        "attrs": {"target_position": np.array([0.1, -0.2], np.float32)},
    }
    params = loop.controller._assemble_params()
    from control_toolkit_tpu.evaluation.closed_loop import _overlay_sweep

    merged, _, _ = _overlay_sweep(params, sweep, N)
    kern = loop._build_kernel_sweep(N, interpret=True, tile_k=tile,
                                    per_slot_dyn=("L",),
                                    per_slot_cost=("ep_weight",))

    ep_keys = jnp.stack(
        [jax.random.fold_in(opt._initial_key, i) for i in range(N)]
    )
    states0 = jax.vmap(opt._init_state)(ep_keys)
    s0s = jnp.tile(jnp.asarray(S0), (N, 1))
    sub = jax.random.PRNGKey(13)
    nk = jax.random.split(sub, N * T).reshape((N, T) + sub.shape)

    _, sT, ss, us, stage, _ = kern(states0, s0s, merged, nk, T)

    kstep = opt._make_batched_rpgd_step(
        N, interpret=True, tile_k=tile,
        per_slot_dyn=("L",), per_slot_cost=("ep_weight",))
    cf = loop.controller.cost_function.cost_function
    s, u_prev, st = s0s, jnp.zeros((N, 1), jnp.float32), states0
    ref_us, ref_stage = [], []
    for t in range(T):
        u, st, _ = kstep(st, s[:, None, :], merged["dyn"], merged["cost"],
                         merged["attrs"])
        ref_stage.append(cf.stage_cost_step(
            s, u, u_prev, {"cost": merged["cost"], "attrs": merged["attrs"]}))
        ref_us.append(u)
        s = env.step_dynamics(s, u, env.dt)
        u_prev = u
    np.testing.assert_allclose(
        np.asarray(us), np.stack([np.asarray(x) for x in ref_us], 1),
        atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stage), np.stack([np.asarray(x) for x in ref_stage], 1),
        atol=1e-4, rtol=1e-5)
    assert not np.allclose(np.asarray(us)[0], np.asarray(us)[1], atol=1e-5)


def _residual_loop():
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi",
                   predictor_specification="ODE+res",
                   optimizer_config=dict(MPPI_CFG))
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    return ClosedLoop(ctrl, env, actuator_noise=0.0, noise_seed=7)


def test_residual_base_dyn_sweep_classifies_for_kernel(monkeypatch):
    """Residual ('ODE+res') scalar constants live at dyn.base.<k>; the
    kernel-sweep classifier must resolve that one-level nesting to the
    BARE base key (what _make_batched_residual_step's per_slot_dyn
    expects) instead of rejecting every residual dyn sweep to the vmapped
    path (review r5)."""
    from control_toolkit_tpu.evaluation.closed_loop import _overlay_sweep

    loop = _residual_loop()
    N = 4
    params = loop.controller._assemble_params()
    merged, _, paths = _overlay_sweep(
        params, {"dyn": {"base": {"L": np.full(N, 0.5, np.float32)}}}, N)
    assert tuple(paths) == ("dyn.base.L",)

    captured = {}

    def fake_build(N_, per_slot_dyn=(), per_slot_cost=(), **kw):
        captured["dyn"] = tuple(per_slot_dyn)
        captured["cost"] = tuple(per_slot_cost)
        return "kernel-program"

    monkeypatch.setattr(loop, "_sweep_kernel_kind", lambda n: "residual")
    monkeypatch.setattr(loop, "_build_kernel_sweep", fake_build)
    prog = loop._swept_kernel_run_for(N, tuple(paths), merged)
    assert prog == "kernel-program"
    assert captured == {"dyn": ("L",), "cost": ()}

    # A NON-residual predictor still rejects nested dyn paths.
    plain = _loop()
    monkeypatch.setattr(plain, "_sweep_kernel_kind", lambda n: "ode")
    pparams = plain.controller._assemble_params()
    pm = dict(pparams)
    assert plain._swept_kernel_run_for(
        N, ("dyn.base.L",), {**pm, "dyn": {"base": {"L": np.zeros(N)}}}
    ) is None


def test_residual_base_dyn_sweep_runs_vmapped():
    """End-to-end dyn.base sweep on CPU (vmapped path): each episode
    plans against its own base length; rows genuinely differ."""
    loop = _residual_loop()
    N, T = 3, 6
    s0s = np.tile(S0, (N, 1))
    L = np.array([0.3, 0.5, 0.9], np.float32)
    out = loop.run_batch(
        s0s, T, sweep_params={"dyn": {"base": {"L": L}}},
        return_trajectories=True)
    assert np.all(np.isfinite(out["mean_costs"]))
    us = np.asarray(out["controls"])
    assert not np.allclose(us[0], us[1], atol=1e-6)
    assert not np.allclose(us[1], us[2], atol=1e-6)
