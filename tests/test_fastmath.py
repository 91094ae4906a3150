"""Polynomial trig approximations (ops/fastmath.py) and the fast_math
predictor path: accuracy bounds, rollout agreement, spec plumbing and
closed-loop behavior."""
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models.predictors import ODEPredictor, PredictorWrapper
from control_toolkit_tpu.ops.fastmath import (
    fast_cos,
    fast_log,
    fast_sin,
    fast_sincos,
)


def test_fast_log_accuracy():
    """Bit-trick log: absolute error bound holds across the full positive
    normal range (exponent handling is exact), incl. the Box-Muller domain
    u in (2^-25, 1]."""
    x = np.concatenate([
        np.linspace(2.0**-25, 1.0, 200001),
        np.logspace(-30, 30, 20001),
    ]).astype(np.float32)
    got = np.asarray(fast_log(jnp.asarray(x)))
    ref = np.log(x.astype(np.float64))
    # 2.1e-6 poly bound in log2 (1.5e-6 in ln) + f32 quantization of the
    # result (one ulp of |ln x|, ~7.6e-6 at ln x = +-69).
    bound = 5e-6 + np.float32(1.2e-7) * np.abs(ref)
    assert np.max(np.abs(got - ref) - bound) < 0


def test_fast_normals_finite_at_u1_equal_one():
    """Counter 30524660 hashes to u1 == 1.0 exactly (found by search);
    fast_log(1.0) lands at +2e-6 poly error, so without the radicand clamp
    Box-Muller's sqrt goes NaN — at rate 2^-24 per draw, i.e. a few times
    per K=1M fused step."""
    from control_toolkit_tpu.ops.pallas_mppi import _normals_from_counter

    c = jnp.asarray([30524660], jnp.uint32)
    z = np.asarray(_normals_from_counter(c, fast=True))
    assert np.isfinite(z).all()
    np.testing.assert_allclose(z, np.asarray(_normals_from_counter(c)),
                               atol=1e-3)


def test_fast_normals_track_exact():
    """fast=True Box-Muller stays within approximation error of the exact
    counter->normal map and keeps its moments."""
    from control_toolkit_tpu.ops.pallas_mppi import _normals_from_counter

    counters = jnp.arange(1 << 17, dtype=jnp.uint32) * jnp.uint32(2654435761)
    exact = np.asarray(_normals_from_counter(counters))
    fast = np.asarray(_normals_from_counter(counters, fast=True))
    assert np.max(np.abs(exact - fast)) < 1e-3
    assert abs(fast.mean()) < 0.01
    assert abs(fast.std() - 1.0) < 0.01


def test_fast_trig_accuracy():
    x = jnp.asarray(np.linspace(-50.0, 50.0, 400001), jnp.float32)
    s, c = fast_sincos(x)
    ref_s = np.sin(np.asarray(x, np.float64))
    ref_c = np.cos(np.asarray(x, np.float64))
    assert np.max(np.abs(np.asarray(s) - ref_s)) < 2e-5
    assert np.max(np.abs(np.asarray(c) - ref_c)) < 2e-5
    np.testing.assert_allclose(np.asarray(fast_sin(x)), np.asarray(s))
    np.testing.assert_allclose(np.asarray(fast_cos(x)), np.asarray(c))


@pytest.mark.parametrize("env", ["cartpole", "pendulum", "acrobot", "quadrotor2d"])
def test_fast_rollout_tracks_exact(env):
    exact = ODEPredictor(env, dt=0.02)
    fast = ODEPredictor(env, dt=0.02, fast_math=True)
    assert fast.dynamics is not exact.dynamics
    rng = np.random.default_rng(0)
    s0 = jnp.asarray(
        0.3 * rng.standard_normal((16, exact.num_states)), jnp.float32
    )
    Q = jnp.asarray(rng.uniform(-1, 1, (16, 50, 1)), jnp.float32)
    a = np.asarray(exact.rollout(s0, Q))
    b = np.asarray(fast.rollout(s0, Q))
    # trig error ~1e-5 compounds over 50 rk4 steps but stays tiny
    np.testing.assert_allclose(a, b, atol=5e-3)
    assert not np.array_equal(a, b)  # genuinely a different trig path


def test_spec_grammar_fast_segment():
    w = PredictorWrapper()
    w.configure(dt=0.02, predictor_specification="ODE:rk4:1:fast",
                environment_name="cartpole")
    assert w.predictor.fast_math
    assert w.predictor.integrator == "rk4"
    assert w.predictor.intermediate_steps == 1
    w2 = PredictorWrapper()
    w2.configure(dt=0.02, predictor_specification="ODE:euler:2",
                 environment_name="pendulum")
    assert not w2.predictor.fast_math
    assert w2.predictor.intermediate_steps == 2


def test_fast_math_closed_loop_cartpole():
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification="ODE:rk4:1:fast",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 20,
                          "num_rollouts": 256, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.03,
                          "period_interpolation_inducing_points": 10},
    )
    env = CartpoleEnv(batch_size=1, dt=0.02, seed=3)
    s, _ = env.reset()
    for _ in range(60):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
    assert abs(float(s[0, 2])) < 0.5, f"fast-math MPC failed: {s[0]}"
