"""CMA-ES optimizer (optimizers/cma_es.py).  Zoo contract/determinism run
via test_optimizer_zoo; this file covers the CMA-specific mechanics: the
strategy constants, convergence on a known quadratic, step-size adaptation,
the sep-CMA diagonal variant, and a closed-loop stabilization run."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from test_optimizer_zoo import make


def _quadratic_cost(target):
    """Replace the rollout cost with sum((Q - target)^2): a pure test of
    the search, independent of dynamics.  Signature matches
    _make_cost_only()'s return."""
    def cost_only(s_tiled, Q, u_prev, params):
        return jnp.sum((Q - target) ** 2, axis=(1, 2))
    return cost_only


def _make_quadratic(target, **extra):
    ctrl = make("cma-es-tf", logging=False, **extra)
    opt = ctrl.optimizer
    opt._make_cost_only = lambda **kw: _quadratic_cost(target)
    opt._build()  # retrace with the patched cost
    return ctrl, opt


def test_cma_constants_match_hansen_defaults():
    """Spot-check the tutorial's default parameterization at N=12, mu=8."""
    ctrl = make("cma-es-tf", logging=False)
    opt = ctrl.optimizer
    N, w, mu_eff, c_s, d_s, c_c, c_1, c_mu, chiN = opt._constants()
    assert N == 12 * 1
    assert w.shape == (8,)
    w_np = np.asarray(w)
    assert np.all(np.diff(w_np) < 0) and abs(w_np.sum() - 1.0) < 1e-6
    assert abs(mu_eff - 1.0 / float((w_np ** 2).sum())) < 1e-4
    assert abs(c_s - (mu_eff + 2.0) / (N + mu_eff + 5.0)) < 1e-9
    assert abs(c_1 - 2.0 / ((N + 1.3) ** 2 + mu_eff)) < 1e-9
    assert abs(chiN - math.sqrt(N) * (1 - 1 / (4 * N) + 1 / (21 * N * N))) < 1e-9
    assert 0.0 < c_1 + c_mu < 1.0


@pytest.mark.parametrize("diagonal", [False, True])
def test_cma_converges_on_quadratic(diagonal):
    """The mean converges to a constant-in-time target plan (the time shift
    repeats the final action, so a constant target is shift-invariant)."""
    ctrl, opt = _make_quadratic(
        0.3, cma_outer_it=8, cma_diagonal=diagonal, num_rollouts=32,
        cma_mu=16, cma_initial_step_size=0.3,
    )
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    for _ in range(12):
        u = ctrl.step(s)
    mean = np.asarray(opt.opt_state.mean)
    assert np.max(np.abs(mean - 0.3)) < 0.05, mean
    assert abs(float(u[0]) - 0.3) < 0.05
    # the step size contracted as the distribution closed in
    assert float(opt.opt_state.sigma) < opt.sigma0


def test_cma_sigma_grows_on_linear_slope():
    """On a linear cost the mean keeps moving in one direction, so CSA must
    GROW sigma (the signature CMA behavior CEM cannot produce).  Unbounded
    controls keep the repair out of the way."""
    ctrl = make("cma-es-tf", logging=False, cma_outer_it=6, num_rollouts=32,
                cma_mu=16)
    opt = ctrl.optimizer
    opt.action_low = jnp.full_like(opt.action_low, -1e9)
    opt.action_high = jnp.full_like(opt.action_high, 1e9)
    opt._make_cost_only = lambda **kw: (
        lambda s_tiled, Q, u_prev, params: jnp.sum(Q, axis=(1, 2))
    )
    opt._build()
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    sigma0 = float(opt.opt_state.sigma)
    for _ in range(4):
        ctrl.step(s)
    assert float(opt.opt_state.sigma) > 2.0 * sigma0


def test_cma_full_covariance_learns_correlations():
    """Cost couples adjacent actions: J = sum((q_{h+1} - q_h)^2) + (q_0-a)^2.
    Full CMA should end with strongly correlated adjacent coordinates in C
    (off-diagonal mass the diagonal variant cannot represent)."""
    def cost(s_tiled, Q, u_prev, params):
        q = Q[:, :, 0]
        smooth = jnp.sum((q[:, 1:] - q[:, :-1]) ** 2, axis=1)
        anchor = (q[:, 0] - 0.5) ** 2
        return 100.0 * smooth + anchor

    ctrl = make("cma-es-tf", logging=False, cma_outer_it=10, num_rollouts=64,
                cma_mu=32)
    opt = ctrl.optimizer
    opt._make_cost_only = lambda **kw: cost
    opt._build()
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    for _ in range(8):
        ctrl.step(s)
    C = np.asarray(opt.opt_state.C)
    d = np.sqrt(np.diag(C))
    corr_adj = np.mean([C[i, i + 1] / (d[i] * d[i + 1] + 1e-12)
                        for i in range(C.shape[0] - 1)])
    assert corr_adj > 0.3, f"adjacent-action correlation not learned: {corr_adj}"


def test_cma_samples_respect_bounds_and_mean_row():
    """Logged population stays in the action box; with the mean candidate
    on, the last row of the first generation equals the (clipped) initial
    mean when only one generation runs."""
    ctrl = make("cma-es-tf", logging=True, cma_outer_it=1,
                cma_initial_step_size=2.0)
    opt = ctrl.optimizer
    mean0 = np.asarray(opt.opt_state.mean).reshape(12, 1)
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ctrl.step(s)
    Q = np.asarray(opt.logging_values["Q_logged"])
    assert Q.shape == (32, 12, 1)
    assert Q.min() >= -1.0 - 1e-6 and Q.max() <= 1.0 + 1e-6
    np.testing.assert_allclose(Q[-1], np.clip(mean0, -1.0, 1.0), atol=1e-6)


def test_cma_rejects_impossible_budget():
    with pytest.raises(ValueError):
        make("cma-es-tf", cma_mu=64, num_rollouts=32)


def test_cma_cartpole_stabilization():
    """Closed loop: hold the pole upright from a perturbation with a small
    budget (same bench as the zoo stabilization test)."""
    from control_toolkit_tpu.environments.cartpole import CartpoleEnv

    ctrl = make("cma-es-tf", logging=False, num_rollouts=64, mpc_horizon=25,
                cma_outer_it=3, cma_mu=16, cma_initial_step_size=0.5,
                warmup=True, warmup_iterations=20)
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=5)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.3, f"cma-es failed to stabilize: {s[0]}"
