"""Data-parallel (mesh-sharded) predictor training.

The reference trains its neural predictors single-device in SI_Toolkit; here
the same fitters run SPMD over a device mesh (minibatch axis sharded, params
replicated, XLA-inserted grad all-reduce).  Per-step math is identical to
the unsharded path up to float reduction order, so single-step parity is
tight; multi-step runs are checked for convergence quality (CLAUDE.md rule:
no long-loop bitwise parity across float-different paths).
"""
import jax
import numpy as np

from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import (
    fit_gru_dynamics,
    fit_mlp_dynamics,
    fit_policy,
)
# Same synthetic linear-dynamics generator the multi-process parity trace
# uses (single source of truth for the DP-training test data).
from control_toolkit_tpu.parallel.launch import training_data as _linear_data
from control_toolkit_tpu.parallel.mesh import make_multislice_mesh, make_rollout_mesh


def _tree_allclose(a, b, **kw):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for va, vb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), **kw)


def test_mlp_dp_single_step_parity():
    x, u, x_next = _linear_data()
    mesh = make_rollout_mesh()
    p0, _ = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=1,
                             batch_size=64, seed=3)
    p1, _ = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=1,
                             batch_size=64, seed=3, mesh=mesh)
    _tree_allclose(p0, p1, rtol=2e-5, atol=2e-6)


def test_mlp_dp_converges_like_unsharded():
    x, u, x_next = _linear_data()
    mesh = make_rollout_mesh()
    _, mse0 = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=300,
                               batch_size=256, seed=3)
    _, mse1 = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=300,
                               batch_size=256, seed=3, mesh=mesh)
    assert mse0 < 0.05 and mse1 < 0.05
    assert abs(mse0 - mse1) < 0.02


def test_mlp_dp_2d_multislice_mesh():
    x, u, x_next = _linear_data(n=256)
    mesh = make_multislice_mesh(2)  # ('slice','k') over the 8 virtual devices
    _, mse0 = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=150,
                               batch_size=128, seed=1)
    _, mse1 = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=150,
                               batch_size=128, seed=1, mesh=mesh)
    assert np.isfinite(mse1)
    assert abs(mse0 - mse1) < 0.05  # same trajectory up to reduction order


def test_mlp_dp_rounds_indivisible_batch():
    x, u, x_next = _linear_data(n=200)
    mesh = make_rollout_mesh()
    # 100 % 8 != 0 -> fitter must round the minibatch, not crash in XLA.
    _, mse = fit_mlp_dynamics(x, u, x_next, hiddens=(8,), epochs=20,
                              batch_size=100, seed=0, mesh=mesh)
    assert np.isfinite(mse)


def test_ensemble_member_axis_parity():
    """Ensemble fitting sharded over the MEMBER axis (ensemble parallelism)
    matches unsharded tightly: members are independent, so sharding changes
    no reduction order inside any member."""
    from control_toolkit_tpu.models.training import fit_ensemble_mlp_dynamics

    x, u, x_next = _linear_data()
    mesh = make_rollout_mesh()
    p0, m0 = fit_ensemble_mlp_dynamics(x, u, x_next, n_members=8,
                                       hiddens=(8,), epochs=50,
                                       batch_size=64, seed=4)
    p1, m1 = fit_ensemble_mlp_dynamics(x, u, x_next, n_members=8,
                                       hiddens=(8,), epochs=50,
                                       batch_size=64, seed=4, mesh=mesh)
    _tree_allclose(p0, p1, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(m0, m1, rtol=2e-4, atol=2e-6)


def test_ensemble_member_axis_requires_divisibility():
    from control_toolkit_tpu.models.training import fit_ensemble_mlp_dynamics
    import pytest

    x, u, x_next = _linear_data(n=128)
    mesh = make_rollout_mesh()
    with pytest.raises(ValueError, match="divide"):
        fit_ensemble_mlp_dynamics(x, u, x_next, n_members=3, hiddens=(8,),
                                  epochs=1, mesh=mesh)


def test_policy_dp_single_step_parity():
    rng = np.random.default_rng(5)
    states = rng.standard_normal((256, 4)).astype(np.float32)
    controls = np.tanh(states[:, :1])
    mesh = make_rollout_mesh()
    p0, _ = fit_policy(states, controls, hiddens=(8,), epochs=1,
                       batch_size=64, seed=2)
    p1, _ = fit_policy(states, controls, hiddens=(8,), epochs=1,
                       batch_size=64, seed=2, mesh=mesh)
    _tree_allclose(p0, p1, rtol=2e-5, atol=2e-6)


def test_gru_dp_single_step_parity():
    rng = np.random.default_rng(9)
    E, T, S, U = 16, 12, 3, 1
    x_seqs = rng.standard_normal((E, T + 1, S)).astype(np.float32)
    u_seqs = rng.uniform(-1, 1, (E, T, U)).astype(np.float32)
    mesh = make_rollout_mesh()
    p0, _ = fit_gru_dynamics(x_seqs, u_seqs, hiddens=(8,), epochs=1,
                             rollout_len=4, batch_size=32, seed=7)
    p1, _ = fit_gru_dynamics(x_seqs, u_seqs, hiddens=(8,), epochs=1,
                             rollout_len=4, batch_size=32, seed=7, mesh=mesh)
    _tree_allclose(p0, p1, rtol=2e-5, atol=2e-6)


def test_mlp_dp_grad_allreduce_in_hlo():
    """The sharded step must actually be data-parallel: the compiled module
    contains a cross-device all-reduce for the gradient combine."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_rollout_mesh()
    key = jax.random.PRNGKey(0)
    params = nets.mlp_init(key, [5, 16, 4])
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    batch = NamedSharding(mesh, P("k"))

    def step(p, o, xb, yb):
        xb = jax.lax.with_sharding_constraint(xb, batch)
        yb = jax.lax.with_sharding_constraint(yb, batch)
        loss, g = jax.value_and_grad(
            lambda p_: jnp.mean((nets.mlp_apply(p_, xb) - yb) ** 2))(p)
        up, o = tx.update(g, o)
        return optax.apply_updates(p, up), o, loss

    xb = jax.numpy.zeros((64, 5)); yb = jax.numpy.zeros((64, 4))
    hlo = jax.jit(step).lower(params, opt, xb, yb).compile().as_text()
    assert "all-reduce" in hlo


def test_gru_fit_rejects_short_episodes():
    """Episodes shorter than rollout_len would feed randint an empty
    range and silently train on clamped (duplicated-terminal) windows."""
    import pytest

    E, T, S, U = 4, 5, 3, 1
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(E, T + 1, S)).astype(np.float32)
    us = rng.normal(size=(E, T, U)).astype(np.float32)
    with pytest.raises(ValueError, match="rollout_len"):
        fit_gru_dynamics(xs, us, hiddens=(8,), epochs=1, rollout_len=8)
    # T == rollout_len is the boundary and must work.
    p, _ = fit_gru_dynamics(xs, us, hiddens=(8,), epochs=1, rollout_len=5)
    assert p is not None


def test_mlp_warm_start_reuses_normalization():
    """A warm start (params=) must keep the provided normalization
    constants — the core weights were trained under them; recomputing
    from the new dataset would discontinuously shift the net's function
    (review r5)."""
    x, u, x_next = _linear_data()
    p0, _ = fit_mlp_dynamics(x, u, x_next, hiddens=(16,), epochs=5,
                             batch_size=64, seed=3)
    # Refit on a SHIFTED dataset: fresh-fit constants would differ.
    x2, u2, x2_next = x + 1.5, u, x_next + 1.5
    p1, _ = fit_mlp_dynamics(x2, u2, x2_next, hiddens=(16,), epochs=1,
                             batch_size=64, seed=4, params=p0)
    for k in ("norm_in_mean", "norm_in_std", "norm_out_mean", "norm_out_std"):
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p0[k]))
    fresh, _ = fit_mlp_dynamics(x2, u2, x2_next, hiddens=(16,), epochs=1,
                                batch_size=64, seed=4)
    assert not np.allclose(np.asarray(fresh["norm_in_mean"]),
                           np.asarray(p0["norm_in_mean"]))
