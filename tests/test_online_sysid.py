"""Residual predictor + online system identification (adaptive MPC).

The capability the reference delegates to offline SI_Toolkit retraining:
a ResidualPredictor ('ODE+res' spec) starts exactly at the analytic model,
OnlineSysId fits its MLP correction to observed transitions, and installing
the fitted weights is a params update, never a recompile.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from control_toolkit_tpu.models.online_sysid import OnlineSysId
from control_toolkit_tpu.models.predictors import ODEPredictor, PredictorWrapper
from control_toolkit_tpu.models.residual_predictor import ResidualPredictor

# The "true" plant: cartpole with a heavier, longer pole than the nominal
# model — a realistic payload-change mismatch.
TRUE_PARAMS = {"m_pole": 0.4, "L": 0.6}


def make_true_plant(dt=0.02):
    return ODEPredictor("cartpole", dt=dt, params=TRUE_PARAMS)


def collect_true_transitions(n, dt=0.02, seed=0):
    """Random-control transitions of the TRUE plant around upright."""
    rng = np.random.default_rng(seed)
    plant = make_true_plant(dt)
    step = plant.single_step
    p = plant.default_params()
    xs = rng.uniform(-0.5, 0.5, size=(n, 4)).astype(np.float32)
    us = rng.uniform(-1.0, 1.0, size=(n, 1)).astype(np.float32)
    sn = np.asarray(step(jnp.asarray(xs), jnp.asarray(us), p))
    return xs, us, sn


def test_residual_predictor_matches_base_at_init():
    pred = ResidualPredictor("cartpole", dt=0.02, seed=4)
    base = pred.base
    rng = np.random.default_rng(1)
    s0 = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 4)).astype(np.float32))
    Q = jnp.asarray(rng.uniform(-1, 1, (8, 15, 1)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pred.rollout(s0, Q)), np.asarray(base.rollout(s0, Q))
    )


def test_spec_grammar_ode_res():
    w = PredictorWrapper()
    w.configure(dt=0.02, predictor_specification="ODE+res:rk4:1:fast",
                environment_name="pendulum")
    assert isinstance(w.predictor, ResidualPredictor)
    assert w.predictor.fast_math and w.num_states == 2
    # params flow as one pytree with both components
    p = w.default_params()
    assert "base" in p and "res" in p


def test_online_sysid_reduces_one_step_error():
    pred = ResidualPredictor("cartpole", dt=0.02, seed=0)
    sysid = OnlineSysId(predictor=pred, capacity=2048, batch_size=256,
                        learning_rate=3e-3, seed=1)
    xs, us, sn = collect_true_transitions(2048)
    for i in range(2048):
        sysid.observe(xs[i], us[i], sn[i])
    base_mse = sysid.one_step_mse(use_residual=False)
    diag = sysid.fit_and_apply(steps=600)
    assert diag["fitted"] == 1.0
    fitted_mse = sysid.one_step_mse(use_residual=True)
    assert diag["loss_after"] < diag["loss_before"]
    assert fitted_mse < 0.25 * base_mse, (base_mse, fitted_mse)


@pytest.mark.slow
def test_adaptive_mpc_closed_loop_improves_model():
    """Full adaptive loop through the controller: MPC with the nominal-model
    residual predictor controls the mismatched true plant; mid-run sysid
    fit drops the model's one-step error on the visited trajectory, and the
    installed weights reach the very next optimizer step (no recompile —
    the params are jit arguments)."""
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification="ODE+res",
                   optimizer_config={
        "seed": 5, "mpc_timestep": 0.02, "mpc_horizon": 20, "num_rollouts": 128,
        "cc_weight": 1.0, "R": 1.0, "LBD": 100.0, "NU": 1000.0,
        "SQRTRHOINV": 0.03, "period_interpolation_inducing_points": 10,
    })
    assert isinstance(ctrl.predictor.predictor, ResidualPredictor)

    plant = make_true_plant()
    plant_step = plant.single_step
    pp = plant.default_params()
    sysid = OnlineSysId(ctrl, capacity=512, batch_size=32,
                        learning_rate=3e-3, seed=2)

    s = np.array([0.0, 0.0, 0.25, 0.0], np.float32)
    for t in range(60):
        u = np.asarray(ctrl.step(s)).reshape(-1)
        s_next = np.asarray(
            plant_step(jnp.asarray(s[None]), jnp.asarray(u[None]), pp)
        )[0]
        sysid.observe(s, u, s_next)
        s = s_next

    base_mse = sysid.one_step_mse(use_residual=False)
    diag = sysid.fit_and_apply(steps=400)
    assert diag["fitted"] == 1.0
    assert sysid.one_step_mse(use_residual=True) < 0.5 * base_mse

    # Installed weights are live in the controller's next step: the cached
    # dyn params were invalidated and re-assembled from the predictor.
    assert ctrl._dyn_params is None
    u2 = ctrl.step(s)
    assert np.all(np.isfinite(np.asarray(u2)))
    res_leaf = ctrl._dyn_params["res"]["w0"]
    np.testing.assert_array_equal(
        np.asarray(res_leaf), np.asarray(ctrl.predictor.predictor._res["w0"])
    )


def test_sysid_refuses_underfilled_buffer():
    pred = ResidualPredictor("cartpole", dt=0.02)
    sysid = OnlineSysId(predictor=pred, capacity=128, batch_size=64)
    sysid.observe(np.zeros(4), np.zeros(1), np.zeros(4))
    assert sysid.fit(steps=10) == {"fitted": 0.0, "count": 1.0}


def test_discarded_fit_resets_adam_state():
    """fit() without apply() abandons that weight trajectory: the next fit
    must restart Adam from the installed weights, not carry stale moments."""
    pred = ResidualPredictor("cartpole", dt=0.02, seed=0)
    sysid = OnlineSysId(predictor=pred, capacity=512, batch_size=64,
                        learning_rate=3e-3, seed=1)
    xs, us, sn = collect_true_transitions(512)
    for i in range(512):
        sysid.observe(xs[i], us[i], sn[i])
    sysid.fit(steps=50)
    assert sysid._pending
    st_discarded = sysid._opt_state
    sysid.fit(steps=50)          # previous result discarded -> fresh Adam
    assert sysid._opt_state is not st_discarded
    sysid.apply()
    assert not sysid._pending
    st_applied = sysid._opt_state
    sysid.fit(steps=50)          # applied -> moments continue
    # Continuation means Adam was NOT re-initialized: the bias-correction
    # counter accumulates fit2's 50 steps plus fit3's 50 (fit1's were
    # discarded together with its state).
    import optax
    assert int(optax.tree_utils.tree_get(sysid._opt_state, "count")) == 100


def test_residual_checkpoint_round_trip(tmp_path):
    """Fitted residual survives save/load into a fresh predictor; a wrong
    state dimension is rejected."""
    pred = ResidualPredictor("cartpole", dt=0.02, seed=0)
    sysid = OnlineSysId(predictor=pred, capacity=512, batch_size=128,
                        learning_rate=3e-3, seed=1)
    xs, us, sn = collect_true_transitions(512)
    for i in range(512):
        sysid.observe(xs[i], us[i], sn[i])
    sysid.fit_and_apply(steps=200)
    path = tmp_path / "residual.npz"
    pred.save_residual(path)

    fresh = ResidualPredictor("cartpole", dt=0.02, seed=99)
    fresh.load_residual(path)
    x = jnp.asarray(xs[:32]); u = jnp.asarray(us[:32])
    np.testing.assert_array_equal(
        np.asarray(pred.single_step(x, u, pred.default_params())),
        np.asarray(fresh.single_step(x, u, fresh.default_params())),
    )

    other = ResidualPredictor("pendulum", dt=0.02)
    import pytest
    with pytest.raises(ValueError, match="num_states"):
        other.load_residual(path)
