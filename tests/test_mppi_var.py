"""MPPI-var (adaptive sampling variance) tests.

The variant's hyperparameter schema comes from the reference's documented
config (config_optimizers.yml:188-201); semantics are reconstructed — see
optimizers/mppi_var.py.  The one behavior the reference's config DOES pin is
"Set LR to 0 to retrieve a mppi version in accordance with mppi paper" —
tested bitwise against MPPIOptimizer's scan path below.
"""
import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.controllers.mpc import MPCController

BASE = {
    "seed": 7,
    "mpc_timestep": 0.02,
    "mpc_horizon": 25,
    "num_rollouts": 256,
    "period_interpolation_inducing_points": 5,
    "cc_weight": 1.0,
    "R": 1.0,
    "LBD_mc": 100.0,
    "SQRTRHOINV_mc": 0.03,
    "NU_mc": 1000.0,
    "LR": 0.5,
    "STDEV_min": 0.01,
    "STDEV_max": 10.0,
    "max_grad_norm": 1000.0,
}


def make(name="mppi-var-tf", cfg_overrides=None, logging=False, env="cartpole"):
    cfg = dict(BASE)
    cfg.update(cfg_overrides or {})
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": name, "controller_logging": logging},
    )
    ctrl.configure(optimizer_name=name, optimizer_config=cfg)
    return ctrl


def test_lr_zero_is_bitwise_standard_mppi():
    """LR=0 must reproduce the paper-MPPI update exactly (the reference's
    documented contract for this variant)."""
    var = make(cfg_overrides={"LR": 0.0})
    mppi_cfg = {
        "seed": 7, "mpc_timestep": 0.02, "mpc_horizon": 25,
        "num_rollouts": 256, "period_interpolation_inducing_points": 5,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.03, "semi_fused": False, "fully_fused": False,
    }
    std = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    std.configure(optimizer_name="mppi", optimizer_config=mppi_cfg)

    # Same PRNG stream: class-name-derived key contexts differ, so pin the
    # initial key (and identical derived state) on both.
    key = var.optimizer.opt_state.key
    std.optimizer.opt_state = std.optimizer.opt_state._replace(key=key)

    s = np.array([0.1, -0.2, 0.15, 0.3], np.float32)
    for _ in range(4):
        u_var = var.step(s)
        u_std = std.step(s)
        np.testing.assert_array_equal(u_var, u_std)
        s = s + 0.01  # move the state so steps differ


def test_stdev_adapts_and_respects_bounds():
    ctrl = make(cfg_overrides={"LR": 5.0, "STDEV_min": 0.05, "STDEV_max": 0.5})
    opt = ctrl.optimizer
    s0 = float(opt.opt_state.stdev[0])
    s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
    moved = False
    for i in range(12):
        ctrl.step(s + 0.01 * i)
        sd = np.asarray(opt.opt_state.stdev)
        assert np.all(sd >= 0.05 - 1e-7) and np.all(sd <= 0.5 + 1e-7)
        if abs(float(sd[0]) - s0) > 1e-7:
            moved = True
    assert moved, "stdev never adapted with LR > 0"


def test_grad_norm_clip_limits_stdev_step():
    """With a tiny max_grad_norm the per-tick sigma change is bounded by
    LR * max_grad_norm."""
    lr, gmax = 2.0, 1e-4
    ctrl = make(cfg_overrides={"LR": lr, "max_grad_norm": gmax})
    opt = ctrl.optimizer
    prev = np.asarray(opt.opt_state.stdev)
    s = np.array([0.3, 0.1, 0.4, -0.2], np.float32)
    for _ in range(3):
        ctrl.step(s)
        cur = np.asarray(opt.opt_state.stdev)
        assert np.all(np.abs(cur - prev) <= lr * gmax * (1 + 1e-3) + 1e-7)
        prev = cur


def test_closed_loop_cartpole_stabilization():
    """MPPI-var must still control.  Stabilization (not swing-up) is the
    right closed-loop task here: minimizing E[S] over sigma legitimately
    *shrinks* the sampling variance toward STDEV_min as the plan converges —
    exploitation — which helps regulation and hurts long-range exploration.
    The shrink itself is asserted as the expected adaptation direction."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv

    ctrl = make(cfg_overrides={
        "mpc_horizon": 35, "num_rollouts": 512,
        "SQRTRHOINV_mc": 0.1, "LBD_mc": 20.0, "LR": 0.05,
        "STDEV_min": 0.05,
    })
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    sigma0 = float(ctrl.optimizer.opt_state.stdev[0])
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.3, f"mppi-var failed to stabilize: {s[0]}"
    sigma = float(ctrl.optimizer.opt_state.stdev[0])
    assert sigma < sigma0, "sampling variance should shrink while regulating"


def test_semi_fused_variance_grad_matches_flat_formula():
    """The semi-fused path computes the sigma gradient with one einsum over
    tile-layout draws; it must equal the scan path's flat-formula gradient
    under the tile<->rollout index mapping (costs2d[r, t*C+c] = rollout
    (t,r,c); eps5[t,u,p,r,c])."""
    import jax
    from control_toolkit_tpu.ops.pallas_mppi import ROWS

    rng = np.random.default_rng(3)
    T, C, P, U = 2, 16, 5, 3
    K = T * ROWS * C
    sigma = jnp.asarray(rng.uniform(0.1, 1.0, (U,)), jnp.float32)
    eps_raw = jnp.asarray(rng.normal(size=(T, U, P * ROWS, C)), jnp.float32)
    costs2d = jnp.asarray(rng.normal(size=(ROWS, T * C)), jnp.float32)

    # tile-layout gradient (as in semi_fused_step_fn, pre-clip)
    adv3 = (costs2d - jnp.mean(costs2d)).reshape(ROWS, T, C)
    raw5 = eps_raw.reshape(T, U, P, ROWS, C)
    sq = jnp.einsum("rtc,tuprc->u", adv3, raw5**2)
    grad_tiles = (sq / K - jnp.mean(adv3) * P) / sigma

    # flat formula (scan path): mean_k adv_k * (sum_p eps^2 - P) / sigma
    eps_flat = np.transpose(np.asarray(raw5), (0, 3, 4, 2, 1)).reshape(K, P, U)
    S_flat = np.zeros(K, np.float32)
    c2 = np.asarray(costs2d)
    for t in range(T):
        for r in range(ROWS):
            for c in range(C):
                S_flat[(t * ROWS + r) * C + c] = c2[r, t * C + c]
    adv = S_flat - S_flat.mean()
    sq_sum = np.sum(eps_flat**2, axis=1)                       # [K, U]
    grad_flat = np.mean(adv[:, None] * (sq_sum - P), axis=0) / np.asarray(sigma)

    np.testing.assert_allclose(np.asarray(grad_tiles), grad_flat,
                               rtol=1e-4, atol=1e-5)


def test_registry_and_logging_contract():
    from control_toolkit_tpu.utils.registry import get_available_optimizer_names

    names = get_available_optimizer_names()
    assert "mppi-var-tf" in names and "mppi-var" in names

    ctrl = make(logging=True)
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ctrl.step(s)
    lv = ctrl.optimizer.logging_values
    assert "Q_logged" in lv and lv["Q_logged"].shape == (256, 25, 1)
    assert "J_logged" in lv and lv["J_logged"].shape == (256,)
    assert "stdev_logged" in lv


def test_plain_mppi_keys_are_dropped_not_fatal():
    """A config that reuses plain-MPPI keys (LBD/NU/SQRTRHOINV, fully_fused,
    optim_steps, bounded_update) must not crash the constructor with a
    duplicate-keyword TypeError, and must not silently install inert
    options — the keys are dropped with a warning and the _mc-suffixed
    schema wins."""
    ctrl = make(cfg_overrides={
        "LBD": 5.0, "NU": 3.0, "SQRTRHOINV": 0.9, "fully_fused": True,
        "optim_steps": 3, "bounded_update": True,
    })
    opt = ctrl.optimizer
    assert opt.LBD == BASE["LBD_mc"] and opt.NU == BASE["NU_mc"]
    assert opt.optim_steps == 0 and not opt.fully_fused
    # still steps fine
    u = ctrl.step(np.array([0.0, 0.0, 0.2, 0.0], np.float32))
    assert np.all(np.isfinite(np.asarray(u)))
