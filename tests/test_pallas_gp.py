"""Fused sparse-GP rollout+cost kernel (ops/pallas_neural.py
build_gp_cost_rollout_kernel): interpret-mode parity vs the fused scan over
the SAME GPPredictor, operand (re-fit) semantics, tile selection, and
sharded execution on the virtual mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.gp_predictor import GPPredictor, fit_gp_dynamics
from control_toolkit_tpu.models.training import collect_transitions


@pytest.fixture(scope="module")
def gp_ckpt(tmp_path_factory):
    env = CartpoleEnv(batch_size=16, dt=0.02, seed=0)
    x, u, xn = collect_transitions(env, 150, seed=0)
    params, _ = fit_gp_dynamics(x, u, xn, num_inducing=64, seed=0)
    path = tmp_path_factory.mktemp("gp") / "sgp.npz"
    GPPredictor("cartpole", dt=0.02, params=params).save(path)
    return str(path)


def make_gp_mppi(gp_ckpt, K=256, H=20, mesh=None):
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification=f"SGP_64:{gp_ckpt}",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5,
        },
        mesh=mesh,
    )
    return ctrl


def _inputs(ctrl, K, H, seed=0):
    key = jax.random.PRNGKey(seed)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-1.0, maxval=1.0)
    u_prev = jnp.array([0.25], jnp.float32)
    return s_tiled, Q, u_prev, ctrl._assemble_params()


def test_gp_kernel_matches_scan(gp_ckpt):
    K, H = 256, 20
    ctrl = make_gp_mppi(gp_ckpt, K, H)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_gp_cost(interpret=True, tile_k=128)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    # combined affine input transform vs the scan's two-stage normalize +
    # lengthscale divide reassociates float ops; exp(-0.5 d2) then amplifies
    # ~2e-4 relative over a 20-step rollout — conditioning, not semantics.
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)


def test_gp_refit_flows_without_rebuild(gp_ckpt):
    """Perturbing the GP posterior weights (a re-fit) changes the kernel's
    output on the next call — the GP params are operands, not trace-time
    constants — and still matches the scan with the same params."""
    K, H = 128, 10
    ctrl = make_gp_mppi(gp_ckpt, K, H)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_gp_cost(interpret=True, tile_k=128)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=4)
    out1 = kernel_cost(s_tiled, Q, u_prev, params)

    params2 = dict(params)
    params2["dyn"] = dict(params["dyn"])
    params2["dyn"]["gp"] = dict(params["dyn"]["gp"])
    params2["dyn"]["gp"]["alpha"] = params["dyn"]["gp"]["alpha"] * 1.5
    out2 = kernel_cost(s_tiled, Q, u_prev, params2)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    ref2 = opt._fused_cost(s_tiled, Q, u_prev, params2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               rtol=1e-3, atol=1e-5)


def test_gp_kernel_sharded(gp_ckpt):
    """shard_map'd GP kernel over the 8-device mesh: GP operands replicated,
    population sharded; equals unsharded to fp tolerance."""
    from control_toolkit_tpu.parallel.mesh import make_rollout_mesh

    K, H = 1024, 10
    mesh = make_rollout_mesh(jax.devices())
    ctrl = make_gp_mppi(gp_ckpt, K, H, mesh=mesh)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_gp_cost(interpret=True, tile_k=128)

    ctrl_ref = make_gp_mppi(gp_ckpt, K, H)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H, seed=2)
    ref = ctrl_ref.optimizer._fused_cost(s_tiled, Q, u_prev,
                                         ctrl_ref._assemble_params())
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)


def test_gp_tile_for_caps_vmem():
    from control_toolkit_tpu.ops.pallas_neural import gp_tile_for

    # M=128: [M, tile]*4B <= 4MB holds at tile=8192 (4 MiB exactly)
    assert gp_tile_for(2 ** 18, 1, num_inducing=128) == 8192
    # M=512 forces the tile down to keep kernel-block VMEM bounded
    assert gp_tile_for(2 ** 18, 1, num_inducing=512) == 2048
    # indivisible K -> 0 (kernel ineligible, scan path)
    assert gp_tile_for(1000, 1, num_inducing=128) == 0
    # Even the floor tile blows the [M, tile] budget at huge M -> 0 (the
    # gate must keep the scan path instead of a doomed Mosaic compile;
    # same final rejection as gp_grad_tile_for — review r5)
    assert gp_tile_for(2 ** 18, 1, num_inducing=1024) == 0


def test_gp_gating_requires_tpu_and_gp_predictor(gp_ckpt):
    """_can_use_pallas_gp is false on CPU backend and for non-GP
    predictors; the scan path stays selected."""
    ctrl = make_gp_mppi(gp_ckpt, K=256, H=10)
    opt = ctrl.optimizer
    assert opt._pallas_gp_compatible_model() is (jax.default_backend() == "tpu")
    if jax.default_backend() != "tpu":
        assert not opt._can_use_pallas_gp()


# ---- gradient twin (ops/pallas_grad.py build_gp_grad_cost_rollout_kernel) --
def make_gp_rpgd(gp_ckpt, K=128, H=12, **over):
    cfg = {
        "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H, "num_rollouts": K,
        "outer_its": 1, "SAMPLING_DISTRIBUTION": "uniform",
        "period_interpolation_inducing_points": 5, "learning_rate": 0.05,
        "gradmax_clip": 5, "opt_keep_k_ratio": 0.25, "resamp_per": 2,
        "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
    }
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="rpgd-tf",
                   predictor_specification=f"SGP_64:{gp_ckpt}",
                   optimizer_config=cfg)
    return ctrl


def test_gp_grad_kernel_matches_xla_ad(gp_ckpt):
    K, H = 128, 12
    ctrl = make_gp_rpgd(gp_ckpt, K, H)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_gp_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)

    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)
    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)
    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=1e-3, atol=1e-5)
    # exp(-0.5 d2) amplifies the affine-transform reassociation through the
    # backward too — tolerance mirrors the forward GP kernel's (near-zero
    # gradient elements show ~2e-4 absolute wobble).
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=2e-3, atol=5e-4)


def test_gp_grad_refit_flows_without_rebuild(gp_ckpt):
    """A re-fit posterior (operands) must flow through the SAME built
    kernel and change the gradient accordingly."""
    K, H = 64, 8
    ctrl = make_gp_rpgd(gp_ckpt, K, H)
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_gp_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    _, dQ_a = grad_fn(s_tiled, Q, u_prev, params)

    params_b = jax.tree_util.tree_map(lambda x: x, params)
    params_b["dyn"] = {"gp": dict(params["dyn"]["gp"])}
    params_b["dyn"]["gp"]["alpha"] = params["dyn"]["gp"]["alpha"] * 1.2
    ref_b = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params_b))
    )(Q)
    _, dQ_b = grad_fn(s_tiled, Q, u_prev, params_b)
    assert not np.allclose(np.asarray(dQ_a), np.asarray(dQ_b))
    np.testing.assert_allclose(np.asarray(dQ_b), np.asarray(ref_b),
                               rtol=2e-3, atol=1e-4)


@pytest.mark.slow
def test_batched_rpgd_gp_matches_single_session(gp_ckpt):
    """Batched RPGD over a sparse-GP predictor (columns-mode GP
    gradient+cost kernels) == the single-session step_fn per session,
    through both surgery branches."""
    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_gp_rpgd(gp_ckpt, K, H)
    opt = ctrl.optimizer
    kstep = opt._make_batched_rpgd_step(B, interpret=True, tile_k=tile)
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(19)
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
                np.asarray(new_states.Q)[b], np.asarray(new_ref.Q),
                atol=5e-4, rtol=5e-4,
            )
        states = new_states


def test_grad_tile_gate_is_gp_aware(gp_ckpt):
    """The batched/sweep gradient-kernel gates must budget the GP backward's
    [M, tile] RBF blocks: a huge inducing set makes the gate return False
    (vmap fallback) instead of letting the binder raise (review finding)."""
    from control_toolkit_tpu.ops.pallas_grad import (
        gp_grad_tile_dividing,
        grad_tile_dividing,
    )

    # The plain tile fits, the GP-aware one must refuse: M so large that
    # even tile=256 blows the 4 MiB RBF-block budget.
    S, H, total_k = 4, 12, 2 ** 15
    assert grad_tile_dividing(S, H, total_k) > 0
    assert gp_grad_tile_dividing(S, H, 8192, total_k) == 0
    # Moderate M shrinks but stays feasible (and divides).
    t = gp_grad_tile_dividing(S, H, 512, total_k)
    assert t >= 256 and total_k % t == 0 and 512 * t * 4 <= 4 * 2 ** 20

    ctrl = make_gp_rpgd(gp_ckpt, K=128, H=12)
    opt = ctrl.optimizer
    # Gate method dispatches to the GP-aware helper for GP predictors.
    assert opt._grad_kernel_tile_ok(2 ** 15) == (
        gp_grad_tile_dividing(opt.num_states, opt.mpc_horizon, 64, 2 ** 15) > 0
    )
    # Simulate a monster inducing set: the gate must refuse, not crash.
    real = opt._gp_num_inducing
    opt._gp_num_inducing = lambda: 8192
    try:
        assert not opt._grad_kernel_tile_ok(2 ** 15)
    finally:
        opt._gp_num_inducing = real
