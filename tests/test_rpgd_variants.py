"""RPGD family variants (rpgd-me / rpgd-me-param / rpgd-ml / rpgd-particle).

The reference documents these optimizers' configs
(config_optimizers.yml:113-186) but ships no code; semantics here are
reconstructions (see optimizers/rpgd.py).  These tests pin the behaviors we
DO define: alpha=0 reduces to base RPGD, the entropy bonus increases
population spread, and the particle resampler draws from the population.
"""
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController

BASE = {
    "seed": 11,
    "mpc_timestep": 0.02,
    "mpc_horizon": 12,
    "num_rollouts": 32,
    "SAMPLING_DISTRIBUTION": "uniform",
    "period_interpolation_inducing_points": 4,
    "learning_rate": 0.05,
    "adam_beta_1": 0.9, "adam_beta_2": 0.999, "adam_epsilon": 1e-8,
    "gradmax_clip": 5, "rtol": 1e-3,
    "opt_keep_k_ratio": 0.25, "outer_its": 2, "resamp_per": 3,
    "sample_stdev": 0.5, "warmup": False, "warmup_iterations": 5,
}


def make(name, logging=False, **extra):
    cfg = dict(BASE)
    if name == "rpgd-particle-tf":
        cfg.pop("SAMPLING_DISTRIBUTION")
    cfg.update(extra)
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": name, "controller_logging": logging},
    )
    ctrl.configure(optimizer_name=name, optimizer_config=cfg)
    return ctrl


@pytest.mark.parametrize(
    "name", ["rpgd-me-tf", "rpgd-me-param-tf", "rpgd-ml-tf", "rpgd-particle-tf"]
)
def test_variant_step_contract(name):
    extra = {"maximum_entropy_alpha": 0.01} if "me" in name or "ml" in name else {}
    ctrl = make(name, logging=True, **extra)
    s = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
    for _ in range(4):  # crosses a resample tick (resamp_per=3)
        u = ctrl.step(s)
    assert u.shape == (1,)
    assert -1.0 - 1e-6 <= float(u[0]) <= 1.0 + 1e-6
    lv = ctrl.optimizer.logging_values
    assert lv["Q_logged"].shape == (32, 12, 1)
    assert np.all(np.isfinite(lv["J_logged"]))
    assert "trajectory_ages_logged" in lv


@pytest.mark.slow
def test_alpha_zero_matches_base_rpgd():
    """maximum_entropy_alpha=0 must be exactly base RPGD (same PRNG stream)."""
    me = make("rpgd-me-tf", maximum_entropy_alpha=0.0)
    base = make("rpgd-tf")
    # Class-name-derived key contexts differ; pin identical initial state.
    base.optimizer.opt_state = me.optimizer.opt_state
    s = np.array([0.1, -0.2, 0.15, 0.3], np.float32)
    for i in range(5):
        u_me = me.step(s + 0.01 * i)
        u_base = base.step(s + 0.01 * i)
        np.testing.assert_array_equal(u_me, u_base)


def test_entropy_bonus_increases_population_spread():
    steps = 6
    spreads = {}
    for alpha in (0.0, 5.0):
        ctrl = make("rpgd-me-tf", maximum_entropy_alpha=alpha,
                    resamp_per=1000)  # no resampling: isolate the gradient
        s = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
        for _ in range(steps):
            ctrl.step(s)
        Q = np.asarray(ctrl.optimizer.opt_state.Q)
        spreads[alpha] = float(np.mean(np.std(Q, axis=0)))
    assert spreads[5.0] > spreads[0.0], spreads


def test_entropy_gradient_finite_at_zero_spread():
    """Zero population variance at a (h,u) column (all rollouts clipped to
    the same bound — routine in bang-bang regimes) must NOT produce a NaN
    entropy gradient: the penalty differentiates log(var + eps), whose
    gradient vanishes at zero spread, not log(std + eps), whose gradient is
    0/0 there."""
    import jax.numpy as jnp

    ctrl = make("rpgd-me-tf", maximum_entropy_alpha=2.0, resamp_per=1000)
    opt = ctrl.optimizer
    st = opt.opt_state
    # Saturate the whole population at the upper bound: zero spread everywhere.
    opt.opt_state = st._replace(Q=jnp.ones_like(st.Q))
    s = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
    u = ctrl.step(s)
    assert np.all(np.isfinite(u))
    assert np.all(np.isfinite(np.asarray(opt.opt_state.Q)))
    # The NaN guard resets state on non-finite u; count>0 proves it didn't.
    assert int(opt.opt_state.count) == 1


def test_grad_tile_budget_fallback():
    """grad_tile_for halves the tile under VMEM pressure and returns 0 when
    even the smallest tile cannot hold the state-history scratch (callers
    then fall back to XLA AD instead of failing at Mosaic compile)."""
    from control_toolkit_tpu.ops.pallas_grad import grad_tile_for

    assert grad_tile_for(4, 50) == 2048      # cartpole: full tile
    assert grad_tile_for(12, 50) == 1024     # quadrotor3d: halved
    assert grad_tile_for(12, 5000) == 0      # cannot fit at any tile


def test_particle_resample_draws_from_population():
    """With tiny jitter and temperature, the resampled rows must coincide
    with (near-copies of) low-cost population members."""
    ctrl = make("rpgd-particle-tf", sample_stdev=1e-4,
                particle_temperature=1e-3, resamp_per=1, outer_its=1)
    opt = ctrl.optimizer
    s = np.array([0.0, 0.0, 0.15, 0.0], np.float32)
    ctrl.step(s)  # count 0 -> resample tick
    Q = np.asarray(opt.opt_state.Q)
    K = Q.shape[0]
    keep_k = opt.opt_keep_k
    n_res = K - keep_k
    # Elites live at the tail ([Qres, Q_keep] ordering); each resampled row
    # must be within jitter distance of SOME elite row.
    elites = Q[n_res:]
    for r in range(n_res):
        d = np.min(np.max(np.abs(elites - Q[r]), axis=(1, 2)))
        assert d < 5e-3, f"resampled row {r} not near any population member ({d})"


def test_particle_closed_loop_stabilization():
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv

    ctrl = make("rpgd-particle-tf", mpc_horizon=35, outer_its=3,
                warmup=True, warmup_iterations=50, sample_stdev=0.3)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.3, f"rpgd-particle failed to stabilize: {s[0]}"


def test_registry_names_present():
    from control_toolkit_tpu.utils.registry import get_available_optimizer_names

    names = get_available_optimizer_names()
    for n in ("rpgd-me-tf", "rpgd-me-param-tf", "rpgd-ml-tf", "rpgd-particle-tf"):
        assert n in names
