"""Aux subsystems: checkpoint/resume, latency tracker, NaN guard, cost
tester, ASF template registration."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

from control_toolkit_tpu.utils import checkpoint
from control_toolkit_tpu.utils.profiling import LatencyTracker


def make_rpgd(seed=3):
    from test_optimizer_zoo import make
    return make("rpgd-tf", logging=False)


def test_checkpoint_roundtrip_resumes_identically(tmp_path):
    a = make_rpgd()
    s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
    for _ in range(3):
        a.step(s)
    ckpt = tmp_path / "opt.npz"
    checkpoint.save_optimizer(ckpt, a.optimizer)
    u_next_a = a.step(s)

    b = make_rpgd()
    checkpoint.load_optimizer(ckpt, b.optimizer)
    u_next_b = b.step(s)
    np.testing.assert_allclose(u_next_a, u_next_b, atol=1e-6)


def test_controller_checkpoint_includes_attrs(tmp_path):
    a = make_rpgd()
    a.step(np.zeros(4, np.float32), updated_attributes={"target_position": 3.0})
    checkpoint.save_controller(tmp_path / "ctrl.npz", a)
    b = make_rpgd()
    checkpoint.load_controller(tmp_path / "ctrl.npz", b)
    assert float(b.variable_parameters["target_position"]) == 3.0


def test_checkpoint_rejects_structurally_different_state(tmp_path):
    """A checkpoint from a different optimizer must not silently load into a
    template whose leading leaves happen to share shapes (ADVICE round 1)."""
    ckpt = tmp_path / "state.npz"
    checkpoint.save_state(ckpt, {"a": np.zeros((3,), np.float32)})
    with pytest.raises(ValueError, match="leaves|treedef"):
        checkpoint.load_state(
            ckpt,
            {"a": np.zeros((3,), np.float32), "b": np.zeros((2,), np.float32)},
        )
    # Same leaf count but different key names -> treedef mismatch.
    with pytest.raises(ValueError, match="treedef"):
        checkpoint.load_state(ckpt, {"z": np.zeros((3,), np.float32)})
    # Float leaf must not silently cast into an int template.
    with pytest.raises(ValueError, match="dtype"):
        checkpoint.load_state(ckpt, {"a": np.zeros((3,), np.int32)})


def test_latency_tracker_percentiles():
    t = LatencyTracker()
    for v in [0.001, 0.002, 0.003, 0.010]:
        t.record(v)
    p = t.percentiles()
    assert 1.0 <= p["p50_ms"] <= 3.0
    assert p["max_ms"] == pytest.approx(10.0)
    assert "p99" in t.report()


def test_nan_guard_resets_and_zeroes():
    from test_optimizer_zoo import make
    ctrl = make("mppi", logging=False)
    # Poison the state: nominal plan full of NaNs -> step output NaN.
    import jax.numpy as jnp
    st = ctrl.optimizer.opt_state
    ctrl.optimizer.opt_state = st._replace(u_nom=jnp.full_like(st.u_nom, jnp.nan))
    u = ctrl.step(np.zeros(4, np.float32))
    np.testing.assert_allclose(u, 0.0)
    # state was reset: next step is finite and nominal is clean
    u2 = ctrl.step(np.zeros(4, np.float32))
    assert np.all(np.isfinite(u2))
    assert np.all(np.isfinite(np.asarray(ctrl.optimizer.opt_state.u_nom)))


def test_cost_tester_collects_components():
    from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost
    from control_toolkit_tpu.costs.tester import CostFunctionTester

    cf = CartpoleQuadraticCost()
    tester = CostFunctionTester(cf)
    states = np.random.default_rng(0).normal(size=(2, 5, 4)).astype(np.float32)
    inputs = np.zeros((2, 5, 1), np.float32)
    for _ in range(4):
        tester.collect_costs(states, inputs)
    arrays = tester.to_arrays()
    assert set(arrays) == {"dd", "ep", "ekp", "cc"}
    assert all(v.shape == (4,) for v in arrays.values())
    fig = tester.plot(show=False)
    assert fig is not None
    assert tester.buffers == {}


def test_asf_template_registers_plugins():
    sys.path.insert(0, "/root/repo")
    from control_toolkit_tpu.utils import registry
    registry.load_asf_package("Control_Toolkit_ASF_Template")
    assert "barebone" in registry.controllers
    assert "environment_name/barebone" in registry.cost_functions

    Ctrl = registry.controllers.get("barebone")
    ctrl = Ctrl(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={},
        config={"gain": 2.0, "controller_logging": False},
    )
    ctrl.configure()
    u = ctrl.step(np.array([0.3, 0.0, 0.0, 0.0], np.float32))
    np.testing.assert_allclose(u, [-0.6], atol=1e-6)


def test_lazy_logging_matches_eager():
    """logging_lazy keeps per-step diagnostics as device arrays (no host
    sync in the hot loop) but get_outputs() must equal the eager mode."""
    from control_toolkit_tpu.controllers.mpc import MPCController
    import jax

    def run(lazy):
        ctrl = MPCController(
            environment_name="cartpole",
            control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
            initial_environment_attributes={"target_position": 0.0},
            config={"optimizer": "mppi", "controller_logging": True,
                    "logging_lazy": lazy},
        )
        ctrl.configure(optimizer_name="mppi", optimizer_config={
            "seed": 9, "mpc_timestep": 0.02, "mpc_horizon": 10,
            "num_rollouts": 32, "cc_weight": 1.0, "R": 1.0, "LBD": 100.0,
            "NU": 1000.0, "SQRTRHOINV": 0.05,
            "period_interpolation_inducing_points": 5})
        s = np.array([0.0, 0.0, 0.2, 0.0], np.float32)
        for _ in range(3):
            ctrl.step(s)
        return ctrl

    eager = run(False)
    lazy = run(True)
    # lazy logs hold device arrays until fetched
    assert any(
        not isinstance(x, np.ndarray)
        for x in lazy.logs["rollout_trajectories_logged"]
    )
    out_e = eager.get_outputs()
    out_l = lazy.get_outputs()
    for k in out_e:
        if out_e[k] is None:
            assert out_l[k] is None
        else:
            np.testing.assert_allclose(out_l[k], out_e[k], atol=1e-7)
            assert out_l[k].shape == out_e[k].shape


def test_unknown_optimizer_config_key_warns():
    """A typo'd hyperparameter must be called out, not silently defaulted."""
    import logging
    from test_optimizer_zoo import make

    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    h = Grab()
    pkg_logger = logging.getLogger("control_toolkit_tpu")
    pkg_logger.addHandler(h)
    try:
        make("mppi", logging=False, SQRTRHOINW=0.1)  # typo'd key
    finally:
        pkg_logger.removeHandler(h)
    assert any("SQRTRHOINW" in m for m in records), records


def test_nan_guard_resets_stateful_predictor_hidden():
    """A non-finite control must never advance a recurrent predictor's
    hidden state (it would be NaN forever); the guard resets it instead."""
    import jax.numpy as jnp

    from control_toolkit_tpu.controllers.mpc import MPCController

    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(
        optimizer_name="mppi",
        predictor_specification="neural:GRU-5IN-8H1-4OUT",
        optimizer_config={"seed": 1, "mpc_timestep": 0.02, "mpc_horizon": 8,
                          "num_rollouts": 16, "cc_weight": 1.0, "R": 1.0,
                          "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                          "period_interpolation_inducing_points": 4},
    )
    s = np.array([0.0, 0.0, 0.1, 0.0], np.float32)
    ctrl.step(s)  # advance hidden once, normally
    st = ctrl.optimizer.opt_state
    ctrl.optimizer.opt_state = st._replace(u_nom=jnp.full_like(st.u_nom, jnp.nan))
    u = ctrl.step(s)
    np.testing.assert_allclose(u, 0.0)
    pred = ctrl.predictor.predictor
    for h in pred.hidden:
        assert np.all(np.isfinite(np.asarray(h))), "hidden poisoned by NaN step"
    u2 = ctrl.step(s)
    assert np.all(np.isfinite(u2))


def test_u_prev_per_rollout_batch_semantics():
    """u_prev may be [B,U]: each rollout's control-change penalty seeds
    with ITS OWN previous control (was silently collapsed to row 0)."""
    import jax.numpy as jnp

    from control_toolkit_tpu.costs.cartpole import CartpoleQuadraticCost

    cf = CartpoleQuadraticCost()
    params = cf.current_params({"target_position": jnp.float32(0.0)})
    B, H, U = 3, 4, 1
    states = jnp.zeros((B, H + 1, 4), jnp.float32)
    inputs = jnp.zeros((B, H, U), jnp.float32)
    u_prev = jnp.asarray([[0.0], [1.0], [2.0]], jnp.float32)  # [B, U]

    cost = np.asarray(cf.get_trajectory_cost(states, inputs, u_prev, params))
    # ccrc = (0 - prev)^2 only at h=0; trajectory cost averages over H+1.
    expected = np.array([0.0, 1.0, 4.0]) / (H + 1)
    np.testing.assert_allclose(cost, expected, atol=1e-6)

    # fused scan path agrees
    from control_toolkit_tpu.ops.rollout import scan_cost_rollout

    cost2, _ = scan_cost_rollout(
        lambda x, u, p: x,
        lambda x, u, up, p: cf.stage_cost_step(x, u, up, {"cost": params["cost"], "attrs": params["attrs"]}),
        lambda x, p: cf.get_terminal_cost(x, {"cost": params["cost"], "attrs": params["attrs"]}),
        jnp.zeros((B, 4)), inputs, u_prev, params,
    )
    np.testing.assert_allclose(np.asarray(cost2), expected, atol=1e-6)


def test_name_index_resolvers():
    """Reference-parity name<->index pickers (globals_and_utils.py:201-264):
    exactly one of name/idx, unknown name -> None (apps re-prompt)."""
    import pytest

    import control_toolkit_tpu as ctt

    names = ctt.get_available_optimizer_names()
    assert "mppi" in names
    n, i = ctt.get_optimizer_name(optimizer_name="mppi")
    assert (n, names[i]) == ("mppi", "mppi")
    assert ctt.get_optimizer_name(optimizer_idx=i) == ("mppi", i)
    assert ctt.get_optimizer_name(optimizer_name="no-such-optimizer") is None
    with pytest.raises(ValueError, match="neither"):
        ctt.get_optimizer_name()
    with pytest.raises(ValueError, match="both"):
        ctt.get_optimizer_name(optimizer_name="mppi", optimizer_idx=0)
    cn, ci = ctt.get_controller_name(controller_name="mpc")
    assert ctt.get_controller_name(controller_idx=ci) == (cn, ci)


def test_checkpoint_extensionless_path_roundtrip(tmp_path):
    """np.savez appends '.npz' to extension-less paths; load_state must
    round-trip the SAME path string (review r5)."""
    import jax.numpy as jnp

    from control_toolkit_tpu.utils import checkpoint as ck

    state = {"a": jnp.arange(4.0), "b": jnp.zeros((2, 2))}
    p = str(tmp_path / "ckpt")          # no extension
    ck.save_state(p, state)
    out = ck.load_state(p, state)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(4.0))


def test_save_optimizer_requires_configure():
    from control_toolkit_tpu.utils import checkpoint as ck

    class Unconfigured:
        opt_state = None

    import pytest
    with pytest.raises(RuntimeError, match="configure"):
        ck.save_optimizer("/tmp/nope", Unconfigured())


def test_state_indices_rejects_unknown_env():
    """A typo'd environment used to yield {} and wire a controller with
    ZERO state inputs that runs and produces garbage (review r5)."""
    import pytest

    from control_toolkit_tpu.models.dynamics import state_indices

    assert state_indices("cartpole")["angle"] == 2
    with pytest.raises(KeyError, match="cart_pole"):
        state_indices("cart_pole")


def test_terminal_chooser_handles_eof_and_bad_name(monkeypatch):
    """EOF at the prompt and a typo'd free-text name both degrade to the
    default instead of crashing server startup (review r5)."""
    from control_toolkit_tpu.serving import gui

    def raise_eof(prompt):
        raise EOFError

    monkeypatch.setattr("builtins.input", raise_eof)
    c, o = gui._choose_terminal(["mpc"], ["mppi", "cem-tf"], "mpc", "mppi")
    assert (c, o) == ("mpc", "mppi")

    answers = iter(["mpc", "mmpi"])  # typo'd optimizer name
    monkeypatch.setattr("builtins.input", lambda prompt: next(answers))
    c, o = gui._choose_terminal(["mpc"], ["mppi", "cem-tf"], "mpc", "mppi")
    assert (c, o) == ("mpc", "mppi")


def test_cost_updater_prunes_dead_refs():
    """The watcher holds WEAK refs: re-configures must not pin dead
    controllers' cost objects forever (review r5)."""
    import gc

    from control_toolkit_tpu.costs.updater import CostFunctionUpdater

    class FakeCost:
        config = {}
        reload_cost_parameters_from_config_flag = False

    a, b = FakeCost(), FakeCost()
    w = CostFunctionUpdater.__new__(CostFunctionUpdater)
    import weakref

    w._cost_refs = [weakref.ref(a), weakref.ref(b)]
    assert len(w.cost_functions) == 2
    del b
    gc.collect()
    assert len(w.cost_functions) == 1
    assert w.cost_functions[0] is a


def test_random_action_diag_gated_on_logging():
    """random-action must not materialize [K,H,U] Q_logged when logging
    is off (zoo convention; review r5)."""
    import jax
    import numpy as np

    from tests.test_ilqr import QuadCost, make_double_integrator
    from control_toolkit_tpu.optimizers.random_action import (
        RandomActionOptimizer,
    )

    def build(logging):
        opt = RandomActionOptimizer(
            predictor=make_double_integrator(0.1), cost_function=QuadCost(),
            control_limits=(np.array([-1.0], np.float32),
                            np.array([1.0], np.float32)),
            optimizer_logging=logging, seed=3, mpc_horizon=8,
            num_rollouts=16,
        )
        opt.configure(num_states=2, num_control_inputs=1, dt=0.1)
        return opt

    s = jax.numpy.asarray(np.array([[0.5, 0.0]], np.float32))
    for opt, want in ((build(False), False), (build(True), True)):
        fn = opt._make_step_fn()
        _, _, diag = fn(opt.opt_state, s, opt.default_params())
        assert ("Q_logged" in diag) == want


def test_value_wrapper_delegates_duck_typed_extras():
    """Undeclared base attributes (cost_components etc.) reach through
    the ValueTerminalCost wrapper (review r5)."""
    import jax
    import pytest

    from control_toolkit_tpu.costs.value_terminal import ValueTerminalCost
    from control_toolkit_tpu.models import networks as nets
    from tests.test_ilqr import QuadCost

    base = QuadCost()
    base.cost_components = lambda: {"pos": 1.0}
    vt = ValueTerminalCost(
        base, nets.mlp_init(jax.random.PRNGKey(0), [2, 4, 1]))
    assert vt.cost_components() == {"pos": 1.0}
    with pytest.raises(AttributeError):
        vt.no_such_attribute_anywhere


def test_arm2_env_retarget_retraces():
    """Arm2Env.get_reward reads self.target at trace time; retargeting
    must retrace (env trace-token override; review r5)."""
    import numpy as np

    from control_toolkit_tpu.environments.arm2 import Arm2Env

    env = Arm2Env(batch_size=1, dt=0.02, seed=0)
    env.reset(seed=1)
    s0 = np.asarray(env.state).copy()
    u = np.array([0.4, -0.2], np.float32)
    _, r_a, *_ = env.step(u)
    env.state = np.asarray(s0)
    env.target = np.array([-0.6, 0.4], np.float32)
    _, r_b, *_ = env.step(u)
    assert not np.allclose(np.asarray(r_a), np.asarray(r_b))
