"""MPPI weighting variants (VERDICT r4 item 3 — the acrobot remedy).

``make_weight_fn`` maps trajectory costs to averaging weights: reference
softmax (optimizer_mppi.py:163-168), temperature-free truncated log-rank
(the CMA-ES recombination shape), or top-k-truncated softmax.  Rank and
top-k are invariant to cost SCALE, so they survive the softmax-cancellation
regime (stage costs >> LBD makes all weight land on one rollout; stage
costs << LBD makes weights uniform and the update cancel on chaotic
plants)."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.environments.pendulum import PendulumEnv
from control_toolkit_tpu.optimizers.mppi import make_weight_fn
from tests.test_mppi import make_mppi


def test_rank_weights_shape_and_truncation():
    costs = jnp.asarray(np.random.RandomState(0).randn(64).astype(np.float32))
    w = make_weight_fn("rank:0.25", LBD=1.0)(costs, (0,))
    h = int(np.ceil(0.25 * 64))
    order = np.argsort(np.asarray(costs))
    w_np = np.asarray(w)
    # exactly h nonzero weights, on the h lowest costs, descending in rank
    assert (w_np > 0).sum() == h
    assert (w_np[order[:h]] > 0).all()
    assert (np.diff(w_np[order[:h]]) < 0).all()
    # expected log-rank values
    np.testing.assert_allclose(
        w_np[order[0]], np.log(h + 0.5) - np.log(1.0), rtol=1e-6)


def test_rank_weights_scale_invariant_softmax_not():
    rs = np.random.RandomState(1)
    costs = jnp.asarray(rs.rand(128).astype(np.float32))
    rank_fn = make_weight_fn("rank", LBD=100.0)
    soft_fn = make_weight_fn("softmax", LBD=100.0)
    w1 = np.asarray(rank_fn(costs, (0,)))
    w2 = np.asarray(rank_fn(costs * 1e6, (0,)))
    np.testing.assert_allclose(w1, w2, rtol=1e-6)
    s1 = np.array(soft_fn(costs, (0,)))
    s1 /= s1.sum()
    s2 = np.array(soft_fn(costs * 1e6, (0,)))
    s2 /= s2.sum()
    # softmax collapses to near one-hot at 1e6 scale — distribution moves
    assert np.abs(s1 - s2).max() > 0.1


def test_topk_zeroes_tail_keeps_softmax_head():
    costs = jnp.arange(40, dtype=jnp.float32)
    w = np.asarray(make_weight_fn("topk:0.25", LBD=5.0)(costs, (0,)))
    assert (w[:10] > 0).all() and (w[10:] == 0).all()
    np.testing.assert_allclose(w[:10], np.exp(-(np.arange(10)) / 5.0),
                               rtol=1e-5)


def test_weight_fn_batched_axes():
    """Session axes stay independent: ranks are computed per session over
    the population axes, in any axis layout (the columns paths use
    [ROWS, B, cps] with axes (0, 2))."""
    rs = np.random.RandomState(2)
    S = jnp.asarray(rs.randn(4, 3, 8).astype(np.float32))  # [R, B, C]
    w = np.asarray(make_weight_fn("rank:0.5", LBD=1.0)(S, (0, 2)))
    ref_fn = make_weight_fn("rank:0.5", LBD=1.0)
    for b in range(3):
        ref = np.asarray(ref_fn(S[:, b, :].reshape(-1), (0,)))
        np.testing.assert_allclose(w[:, b, :].reshape(-1), ref, rtol=1e-6)


def test_weighting_validated_at_construction():
    with pytest.raises(ValueError, match="weighting"):
        make_mppi(weighting="banana")
    with pytest.raises(ValueError, match="fraction"):
        make_mppi(weighting="rank:0.0")
    # A fraction on softmax is a config mistake (it would be silently
    # ignored): reject eagerly instead.
    with pytest.raises(ValueError, match="softmax"):
        make_mppi(weighting="softmax:0.1")


def test_rank_weighting_swings_up_pendulum():
    """Closed-loop sanity: rank weighting solves the pendulum swing-up with
    a deliberately mis-scaled LBD (1e6 x the stage cost — the softmax
    cancellation regime where reference weighting goes near-uniform)."""
    ctrl = make_mppi(env="pendulum", weighting="rank", LBD=1e8,
                     mpc_horizon=50, SQRTRHOINV=0.2,
                     period_interpolation_inducing_points=5)
    env = PendulumEnv(batch_size=1, dt=0.02, seed=2)
    s, _ = env.reset()
    held = 0
    for _ in range(175):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        if 1.0 - np.cos(float(s[0, 0])) < 0.05:
            held += 1
    assert held > 20, f"pendulum never held upright (held={held})"


def test_fully_fused_gate_requires_softmax():
    ctrl = make_mppi(weighting="rank", fully_fused=True)
    assert not ctrl.optimizer._can_fully_fuse()
    ctrl2 = make_mppi(fully_fused=True)
    # other conjuncts may still block off-TPU; the weighting conjunct
    # specifically must pass for softmax
    assert ctrl2.optimizer.weighting == "softmax"
