"""Fused RESIDUAL ('ODE+res') kernels: interpret-mode parity of the
rollout+cost kernel (ops/pallas_neural.build_residual_cost_rollout_kernel)
and its gradient twin (ops/pallas_grad.build_residual_grad_cost_rollout_
kernel) against the fused scan over the SAME ResidualPredictor — the
adaptive-MPC hot path (base constants in SMEM, residual MLP weights as VMEM
operands, so online-sysid installs never recompile)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController


def make_residual_ctrl(K=128, H=12, optimizer="mppi", fitted=True, **over):
    cfgs = {
        "mppi": {
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5,
        },
        "rpgd-tf": {
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": H,
            "num_rollouts": K, "outer_its": 1,
            "SAMPLING_DISTRIBUTION": "uniform",
            "period_interpolation_inducing_points": 5,
            "learning_rate": 0.05, "gradmax_clip": 5,
            "opt_keep_k_ratio": 0.25, "resamp_per": 2,
            "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 2,
        },
    }
    cfg = dict(cfgs[optimizer])
    cfg.update(over)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.3},
        config={"optimizer": optimizer, "controller_logging": False},
    )
    ctrl.configure(optimizer_name=optimizer,
                   predictor_specification="ODE+res",
                   optimizer_config=cfg)
    if fitted:
        # A zero-initialized residual is exactly the base ODE; install a
        # small nonzero correction so the MLP actually participates.
        pred = ctrl.optimizer.predictor.predictor
        key = jax.random.PRNGKey(11)
        res = {
            k: (0.02 * jax.random.normal(jax.random.fold_in(key, i), v.shape)
                if k.startswith("w") else v)
            for i, (k, v) in enumerate(sorted(pred._res.items()))
        }
        pred.set_residual(res)
        ctrl._dyn_params = None
    return ctrl


def _inputs(ctrl, K, H, seed=0):
    key = jax.random.PRNGKey(seed)
    s_tiled = jnp.tile(jnp.array([[0.1, -0.2, 0.3, 0.05]], jnp.float32), (K, 1))
    Q = jax.random.uniform(key, (K, H, 1), minval=-0.8, maxval=0.8)
    u_prev = jnp.array([0.25], jnp.float32)
    return s_tiled, Q, u_prev, ctrl._assemble_params()


def test_residual_cost_kernel_matches_scan():
    K, H = 128, 12
    ctrl = make_residual_ctrl(K, H)
    opt = ctrl.optimizer
    kernel_cost = opt._build_pallas_residual_cost(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    # The residual must be live (not the zero init) for this to test the
    # MLP path at all.
    assert float(jnp.abs(params["dyn"]["res"]["w0"]).max()) > 0
    ref = opt._fused_cost(s_tiled, Q, u_prev, params)
    out = kernel_cost(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_residual_grad_kernel_matches_xla_ad():
    K, H = 128, 12
    ctrl = make_residual_ctrl(K, H, optimizer="rpgd-tf")
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_residual_grad(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)

    ref_costs = opt._fused_cost(s_tiled, Q, u_prev, params)
    ref_grad = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params))
    )(Q)
    cost, dQ = grad_fn(s_tiled, Q, u_prev, params)
    np.testing.assert_allclose(np.asarray(cost), np.asarray(ref_costs),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dQ), np.asarray(ref_grad),
                               rtol=1e-3, atol=5e-4)


def test_residual_sysid_install_flows_without_rebuild():
    """The adaptive-MPC contract: an online-sysid residual install (and a
    base-constant change) must flow through the SAME built kernels."""
    K, H = 64, 8
    ctrl = make_residual_ctrl(K, H, optimizer="rpgd-tf")
    opt = ctrl.optimizer
    grad_fn = opt._build_pallas_residual_grad(interpret=True, tile_k=64)
    cost_fn = opt._build_pallas_residual_cost(interpret=True, tile_k=64)
    s_tiled, Q, u_prev, params = _inputs(ctrl, K, H)
    c_a = cost_fn(s_tiled, Q, u_prev, params)
    _, dQ_a = grad_fn(s_tiled, Q, u_prev, params)

    # New residual fit + perturbed base constant, same compiled callables.
    params_b = {
        "dyn": {
            "base": {k: v * 1.1 for k, v in params["dyn"]["base"].items()},
            "res": jax.tree_util.tree_map(
                lambda x: x * 1.5, params["dyn"]["res"]),
        },
        "cost": params["cost"], "attrs": params["attrs"],
    }
    ref_c = opt._fused_cost(s_tiled, Q, u_prev, params_b)
    ref_g = jax.grad(
        lambda q: jnp.sum(opt._fused_cost(s_tiled, q, u_prev, params_b))
    )(Q)
    c_b = cost_fn(s_tiled, Q, u_prev, params_b)
    _, dQ_b = grad_fn(s_tiled, Q, u_prev, params_b)
    assert not np.allclose(np.asarray(c_a), np.asarray(c_b))
    assert not np.allclose(np.asarray(dQ_a), np.asarray(dQ_b))
    np.testing.assert_allclose(np.asarray(c_b), np.asarray(ref_c),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dQ_b), np.asarray(ref_g),
                               rtol=1e-3, atol=5e-4)


@pytest.mark.slow
def test_batched_rpgd_residual_matches_single_session():
    """Batched RPGD over the residual predictor — including a PER-SLOT base
    constant (heterogeneous fleet of sysid'd plants) — == the
    single-session step_fn per session through both surgery branches."""
    B, K, H, tile = 2, 32, 10, 64
    ctrl = make_residual_ctrl(K, H, optimizer="rpgd-tf")
    opt = ctrl.optimizer
    base_keys = sorted(opt.predictor.predictor.base.default_params())
    slot_key = base_keys[0]
    kstep = opt._make_batched_rpgd_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=(slot_key,)
    )
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
    base_v = float(params["dyn"]["base"][slot_key])
    slot_vals = jnp.asarray([base_v, base_v * 1.3], jnp.float32)

    step_fn = opt._make_step_fn()
    for tick in range(2):
        dyn_b = {
            "base": dict(params["dyn"]["base"], **{slot_key: slot_vals}),
            "res": params["dyn"]["res"],
        }
        u, new_states, costs = kstep(
            states, s_b, dyn_b, params["cost"],
            {"target_position": attrs_vec},
        )
        for b in range(B):
            st_b = jax.tree_util.tree_map(lambda x: x[b], states)
            p_b = {
                "dyn": {
                    "base": dict(params["dyn"]["base"],
                                 **{slot_key: slot_vals[b]}),
                    "res": params["dyn"]["res"],
                },
                "cost": params["cost"],
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


def test_batched_residual_kernel_matches_xla_reference():
    """Columns-mode RESIDUAL kernel (B MPPI sessions, one launch,
    PER-SLOT base constant) == per-session XLA reference (residual scan
    rollout + trajectory cost + correction + softmax) with the same
    injected inducing-point noise."""
    B, K, H, tile = 2, 64, 10, 128
    ctrl = make_residual_ctrl(K, H, optimizer="mppi")
    opt = ctrl.optimizer
    pred = opt.predictor.predictor
    slot_key = sorted(pred.base.default_params())[0]
    _, update_from_eps = opt._make_batched_residual_step(
        B, interpret=True, tile_k=tile, per_slot_dyn=(slot_key,)
    )
    params = jax.tree_util.tree_map(
        lambda v: jnp.asarray(v, jnp.float32), ctrl._assemble_params()
    )
    U = opt.num_control_inputs
    P = opt.interp.number_of_interpolation_inducing_points
    keys = jnp.stack(
        [jax.random.fold_in(jax.random.PRNGKey(0), i) for i in range(B)]
    )
    states = jax.vmap(opt._init_state)(keys)
    rng = np.random.default_rng(17)
    s_b = jnp.asarray(rng.uniform(-0.3, 0.3, size=(B, 1, 4)), jnp.float32)
    attrs = {"target_position": jnp.asarray(
        np.linspace(-0.5, 0.5, B), jnp.float32)}
    base_v = float(params["dyn"]["base"][slot_key])
    slot_vals = jnp.asarray([base_v, base_v * 1.4], jnp.float32)
    dyn_b = {
        "base": dict(params["dyn"]["base"], **{slot_key: slot_vals}),
        "res": params["dyn"]["res"],
    }
    delta_b = jnp.asarray(
        rng.normal(0.0, opt.SQRTRHODTINV, size=(B, K, P, U)), jnp.float32
    )

    u_nom_new, costs = update_from_eps(
        states, s_b, dyn_b, params["cost"], attrs, delta_b
    )

    for b in range(B):
        un_shift = np.concatenate(
            [np.asarray(states.u_nom)[b, 0, 1:],
             np.asarray(states.u_nom)[b, 0, -1:]], axis=0)
        delta = np.asarray(opt.interp.interpolate(delta_b[b]))
        Q = np.clip(un_shift[None] + delta, -1.0, 1.0)
        s_tiled = jnp.tile(s_b[b], (K, 1))
        dyn_ref = {
            "base": dict(params["dyn"]["base"], **{slot_key: slot_vals[b]}),
            "res": params["dyn"]["res"],
        }
        traj = opt.predictor.rollout(s_tiled, jnp.asarray(Q), dyn_ref)
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


def _cartpole_base_key():
    from control_toolkit_tpu.models.predictors import ODEPredictor

    return sorted(ODEPredictor(environment_name="cartpole").default_params())[0]


def test_batched_mpc_residual_per_slot_dyn_vmap_path():
    """BatchedMPCController over 'ODE+res' with per_slot_dyn: the per-slot
    leaves nest under the 'base' subtree (dyn_axes / params overlay), and a
    sysid push to one slot changes ONLY that slot's control (CPU vmap
    path — the same overlay feeds the kernel path on TPU)."""
    from control_toolkit_tpu.controllers.batched_mpc import (
        BatchedMPCController,
    )

    B = 2
    ctrl = BatchedMPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification="ODE+res",
        optimizer_config={
            "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 8,
            "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 4,
        },
        num_slots=B,
        per_slot_dyn=(_cartpole_base_key(),),
    )
    slot_key = ctrl._per_slot_dyn[0]
    s = np.tile(np.array([0.1, 0.0, 0.2, 0.0], np.float32), (B, 1))
    snap = jax.tree_util.tree_map(lambda x: x, ctrl.slot_states)
    u_a = np.asarray(ctrl.step_batch(s))

    # Replay the SAME slot states (incl. PRNG keys) with a sysid push to
    # slot 1 only: slot 0's control must be unchanged, slot 1's must move.
    ctrl.slot_states = snap
    ctrl.update_slot_dyn(1, {slot_key: ctrl._slot_dyn_defaults[slot_key] * 2.0})
    u_b = np.asarray(ctrl.step_batch(s))
    np.testing.assert_allclose(u_b[0], u_a[0], atol=1e-6)
    assert not np.allclose(u_b[1], u_a[1], atol=1e-6)
