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
