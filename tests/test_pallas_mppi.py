"""Fully-fused MPPI kernel (interpret mode): statistical + closed-loop checks.

The in-kernel PRNG differs from jax.random, so validation is statistical
(cost distribution matches the modular path) and behavioral (closed-loop
stabilization), not bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from test_pallas_rollout import make_mppi_ctrl


def build(K=256, H=20, tile=128):
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    kernel_step, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    return ctrl, opt, kernel_step, pack, params


def test_fused_mppi_cost_distribution_matches_modular():
    K, H = 256, 20
    ctrl, opt, kernel_step, pack, params = build(K, H)
    s0 = jnp.array([0.1, 0.0, 0.3, -0.2], jnp.float32)
    u_nom = jnp.zeros((H, 1), jnp.float32)
    u_prev = jnp.zeros((1,), jnp.float32)

    u_nom_new, costs = kernel_step(s0, u_nom, pack(params, u_prev),
                                   jnp.array([123], jnp.int32))
    costs = np.asarray(costs)
    assert costs.shape == (K,)
    assert np.all(np.isfinite(costs))

    # Modular path on the same state with jax.random sampling.
    s_tiled = jnp.tile(s0[None], (K, 1))
    key = jax.random.PRNGKey(0)
    delta = (jax.random.normal(key, (K, opt.interp.number_of_interpolation_inducing_points, 1))
             * opt.SQRTRHODTINV)
    delta = opt.interp.interpolate(delta)
    u_run = jnp.clip(u_nom[None] + delta, -1.0, 1.0)
    base = opt._fused_cost(s_tiled, u_run, u_prev, params)
    corr = jnp.sum(
        opt.cc_weight * (0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                         + opt.R * u_run * delta + 0.5 * opt.R * u_run**2),
        axis=(1, 2),
    )
    ref_costs = np.asarray(base + corr)

    # Same state, same nominal, same noise scale: distributions must agree.
    assert abs(costs.mean() - ref_costs.mean()) < 0.15 * abs(ref_costs.mean())
    assert abs(costs.std() - ref_costs.std()) < 0.5 * ref_costs.std()

    # The nominal update moved toward lower cost and stayed in bounds.
    u_new = np.asarray(u_nom_new)
    assert np.all(u_new >= -1.0) and np.all(u_new <= 1.0)
    assert not np.allclose(u_new, 0.0)


def test_fused_mppi_seed_determinism():
    ctrl, opt, kernel_step, pack, params = build()
    s0 = jnp.array([0.0, 0.0, 0.2, 0.0], jnp.float32)
    u_nom = jnp.zeros((20, 1), jnp.float32)
    pv = pack(params, jnp.zeros((1,), jnp.float32))
    un1, c1 = kernel_step(s0, u_nom, pv, jnp.array([7], jnp.int32))
    un2, c2 = kernel_step(s0, u_nom, pv, jnp.array([7], jnp.int32))
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2))
    np.testing.assert_allclose(np.asarray(un1), np.asarray(un2))
    _, c3 = kernel_step(s0, u_nom, pv, jnp.array([8], jnp.int32))
    assert not np.allclose(np.asarray(c1), np.asarray(c3))


def test_fused_mppi_closed_loop_stabilizes():
    K, H = 256, 25
    ctrl, opt, kernel_step, pack, params = build(K, H)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    s, _ = env.reset()
    u_nom = jnp.zeros((H, 1), jnp.float32)
    u_prev = jnp.zeros((1,), jnp.float32)
    for t in range(50):
        u_nom = jnp.concatenate([u_nom[1:], u_nom[-1:]], axis=0)
        u_nom, _ = kernel_step(
            jnp.asarray(s[0]), u_nom, pack(params, u_prev),
            jnp.array([t + 1], jnp.int32),
        )
        u_prev = u_nom[0]
        s, *_ = env.step(np.asarray(u_prev))
    assert abs(float(s[0, 2])) < 0.2, f"fused MPPI failed to stabilize: {s[0]}"


def test_fused_mppi_multislice_bitwise_equals_single_device():
    """2-D ('slice','k') mesh: the fused step shards K over BOTH axes (ICI
    within a slice, DCN scalar combine across slices) and must stay bitwise
    equal to the single-device run."""
    from control_toolkit_tpu.parallel.mesh import make_multislice_mesh

    K, H, tile = 1024, 20, 128
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    kernel_step, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    mesh = make_multislice_mesh(2)
    assert mesh.devices.shape == (2, 4)
    step_sharded = opt._last_fused_make_run(K, mesh=mesh)  # axis=None -> all axes

    s0 = jnp.array([0.1, 0.0, 0.25, -0.1], jnp.float32)
    u_nom = jnp.zeros((H, 1), jnp.float32)
    pv = pack(params, jnp.zeros(1))
    seed = jnp.array([17], jnp.int32)

    un_a, costs_a = kernel_step(s0, u_nom, pv, seed)
    un_b, costs_b = step_sharded(s0, u_nom, pv, seed)
    # Per-rollout costs are computed before any collective -> bitwise equal.
    np.testing.assert_array_equal(
        np.sort(np.asarray(costs_a)), np.sort(np.asarray(costs_b))
    )
    # The nominal update crosses a hierarchical (ICI+DCN) psum whose
    # reduction order differs from the flat single-device sum -> float32
    # associativity noise only.
    np.testing.assert_allclose(
        np.asarray(un_a), np.asarray(un_b), rtol=1e-5, atol=1e-7
    )


def test_fused_mppi_per_input_asymmetric_bounds():
    """2-input system with DIFFERENT bounds per input: the in-kernel clip
    must apply each input's own bounds (regression: element [0] was used for
    all inputs).  The expected cost is reconstructed exactly in XLA from the
    same counter-based noise the kernel generates."""
    from control_toolkit_tpu.ops.interpolation import Interpolator
    from control_toolkit_tpu.ops.pallas_mppi import (
        ROWS, _normals, build_fused_mppi_step,
    )

    S, U, H, tile = 2, 2, 8, 64
    K = tile  # single tile: tile_id = 0
    interp = Interpolator.build(H, 3)
    P = interp.number_of_interpolation_inducing_points
    W = np.asarray(interp.matrix, np.float32)           # [P, H]

    def derivs(xs, us, p):
        return (us[0], us[1])

    def stage(xs, us, prev_us, p):
        return us[0] + us[1]

    def term(xs, p):
        return 0.0 * xs[0]

    low = np.array([-0.2, -1.0], np.float32)
    high = np.array([1.0, 0.1], np.float32)
    stdev = 0.7
    make_run = build_fused_mppi_step(
        derivs, stage, term, num_states=S, num_controls=U, horizon=H,
        num_inducing=P, interp_matrix=W, dt=0.1,
        param_keys=("__u_prev_0", "__u_prev_1"),
        cc_weight=0.0, R=1.0, NU=1000.0, LBD=10.0, stdev=stdev,
        action_low=low, action_high=high, integrator="euler",
        intermediate_steps=1, tile_k=tile, interpret=True,
    )
    step = make_run(K)
    seed_val = 42
    u_nom_new, costs = step(
        jnp.zeros((S,), jnp.float32), jnp.zeros((H, U), jnp.float32),
        jnp.zeros((U,), jnp.float32), jnp.array([seed_val], jnp.int32),
    )

    # Regenerate the kernel's noise and apply per-input clipping in XLA.
    C = tile // ROWS
    Wk = jnp.asarray(np.kron(W.T, np.eye(ROWS, dtype=np.float32)))
    stride = P * tile
    expected = np.zeros((ROWS, C), np.float32)
    for j in range(U):
        base = np.uint32((seed_val * 0x01000193 + j * stride) & 0xFFFFFFFF)
        z = _normals(jnp.uint32(base), (P * ROWS, C)) * stdev
        d = np.asarray(jnp.dot(Wk, z, preferred_element_type=jnp.float32))
        for h in range(H):
            expected += np.clip(d[h * ROWS:(h + 1) * ROWS, :], low[j], high[j])
    expected = (expected / (H + 1)).reshape(-1)
    np.testing.assert_allclose(np.asarray(costs), expected, rtol=1e-5, atol=1e-6)

    # The nominal update also respects per-input bounds.
    un = np.asarray(u_nom_new)
    for j in range(U):
        assert np.all(un[:, j] >= low[j] - 1e-6)
        assert np.all(un[:, j] <= high[j] + 1e-6)


def test_semi_fused_matches_modular_reference():
    """Semi-fused kernel (external jax.random noise, in-kernel interpolation
    + clip + rollout + cost) must match the modular XLA math on the SAME
    noise, and the linearity-based weighted update must equal the full
    [K,H,U] weighted average."""
    from control_toolkit_tpu.ops.pallas_mppi import ROWS

    K, H, tile = 256, 20, 128
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    _, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    cost_run = opt._last_fused_make_run.external(K)

    U = 1
    P = opt.interp.number_of_interpolation_inducing_points
    T, C = K // tile, tile // ROWS
    key = jax.random.PRNGKey(5)
    eps = jax.random.normal(key, (T, U, P * ROWS, C)) * opt.SQRTRHODTINV

    s0 = jnp.array([0.1, -0.05, 0.3, 0.2], jnp.float32)
    u_nom = 0.1 * jnp.ones((H, U), jnp.float32)
    u_prev = jnp.array([0.2], jnp.float32)
    pv = pack(params, u_prev)
    costs2d = np.asarray(cost_run(s0, u_nom, pv, eps))
    assert costs2d.shape == (ROWS, T * C)

    # Reference: same noise through the modular XLA path.
    eps5 = np.asarray(eps).reshape(T, U, P, ROWS, C)
    eps_flat = np.transpose(eps5, (0, 3, 4, 2, 1)).reshape(K, P, U)
    delta = opt.interp.interpolate(jnp.asarray(eps_flat))           # [K, H, U]
    u_run = jnp.clip(u_nom[None] + delta, -1.0, 1.0)
    s_tiled = jnp.tile(s0[None], (K, 1))
    base = opt._fused_cost(s_tiled, u_run, u_prev, params)
    corr = jnp.sum(
        opt.cc_weight * (0.5 * (1 - 1 / opt.NU) * opt.R * delta**2
                         + opt.R * u_run * delta + 0.5 * opt.R * u_run**2),
        axis=(1, 2),
    )
    ref = np.asarray(base + corr)                                   # flat k order

    got = np.zeros(K, np.float32)
    for t in range(T):
        got[t * tile:(t + 1) * tile] = costs2d[:, t * C:(t + 1) * C].reshape(-1)
    np.testing.assert_allclose(got, ref, rtol=3e-5, atol=1e-4)

    # Weighted update via inducing-point linearity == full-tensor average.
    LBD = opt.LBD
    w_flat = np.exp(-(ref - ref.min()) / LBD)
    b_ref = np.asarray(
        jnp.sum(jnp.asarray(w_flat)[:, None, None] * delta, axis=0) / w_flat.sum()
    )
    w2d = jnp.asarray(got.reshape(T, ROWS, C).transpose(1, 0, 2))   # [R, T, C]
    w2d = jnp.exp(-(w2d - got.min()) / LBD)
    ws = jnp.einsum("rtc,tuprc->up", w2d, jnp.asarray(eps5)) / w_flat.sum()
    b_lin = np.asarray(jnp.einsum("ph,up->hu", jnp.asarray(opt.interp.matrix), ws))
    np.testing.assert_allclose(b_lin, b_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("mesh_kind", ["1d", "multislice"])
def test_semi_fused_sharded_matches_unsharded(mesh_kind):
    """The semi-fused cost kernel under shard_map (noise sampled globally in
    XLA, tiles split across devices — 1-D and 2-D ('slice','k') meshes)
    must equal the single-device run."""
    from control_toolkit_tpu.ops.pallas_mppi import ROWS
    from control_toolkit_tpu.parallel.mesh import (
        make_multislice_mesh, make_rollout_mesh,
    )

    K, H, tile = 1024, 20, 128
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    _, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)
    run_a = opt._last_fused_make_run.external(K)
    if mesh_kind == "1d":
        run_b = opt._last_fused_make_run.external(K, mesh=make_rollout_mesh(), axis="k")
    else:
        run_b = opt._last_fused_make_run.external(K, mesh=make_multislice_mesh(2))

    U, P = 1, opt.interp.number_of_interpolation_inducing_points
    T, C = K // tile, tile // ROWS
    eps = jax.random.normal(jax.random.PRNGKey(2), (T, U, P * ROWS, C)) * 0.5
    s0 = jnp.array([0.1, 0.0, 0.25, -0.1], jnp.float32)
    u_nom = jnp.zeros((H, U), jnp.float32)
    pv = pack(params, jnp.zeros(1))

    a = np.asarray(run_a(s0, u_nom, pv, eps))
    b = np.asarray(run_b(s0, u_nom, pv, eps))
    np.testing.assert_array_equal(a, b)


def test_fused_mppi_sharded_bitwise_equals_single_device():
    """shard_map over 8 virtual devices: the sharded fused step must produce
    BITWISE the same costs and nominal update as the single-device run
    (global-tile-keyed noise counters + pmin/psum reductions)."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H, tile = 1024, 20, 128
    ctrl = make_mppi_ctrl(K, H)
    opt = ctrl.optimizer
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )

    # Build through the raw builder to control mesh/tile/interpret.
    import numpy as _np
    from control_toolkit_tpu.ops.pallas_mppi import build_fused_mppi_step

    cf = opt.cost_function.cost_function
    pred = opt.predictor.predictor
    kernel_step, pack, _ = opt._build_fused_mppi(interpret=True, tile_k=tile)

    # Re-make with a mesh (reuse the bound builder via the private method's
    # internals): call the builder again with identical config.
    make_run = opt._last_fused_make_run
    step_sharded = make_run(K, mesh=make_rollout_mesh(), axis="k")

    s0 = jnp.array([0.1, 0.0, 0.25, -0.1], jnp.float32)
    u_nom = jnp.zeros((H, 1), jnp.float32)
    pv = pack(params, jnp.zeros(1))
    seed = jnp.array([11], jnp.int32)

    un_a, costs_a = kernel_step(s0, u_nom, pv, seed)
    un_b, costs_b = step_sharded(s0, u_nom, pv, seed)

    # The cost vector's flattening order differs between the single-device
    # [8, K/8] layout and the per-device concatenation; MPPI is permutation
    # invariant, so compare as multisets and require the UPDATE to be exact.
    np.testing.assert_array_equal(
        np.sort(np.asarray(costs_a)), np.sort(np.asarray(costs_b))
    )
    np.testing.assert_array_equal(np.asarray(un_a), np.asarray(un_b))
