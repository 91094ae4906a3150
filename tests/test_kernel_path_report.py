"""Configure-time kernel-path eligibility notice (VERDICT r3 weak #2):
`Optimizer.kernel_path_report` names every documented gate conjunct that
blocks the Pallas fast path, and `configure()` logs one INFO line so a
silent 2-6x fallback is legible.  The PATH decision itself always comes
from the real gates (`_can_use_pallas*`), never re-derived."""
import logging

import numpy as np
import pytest

from control_toolkit_tpu.controllers.mpc import MPCController
from tests.test_optimizer_zoo import make


@pytest.fixture
def ctt_propagate():
    """The package logger sets propagate=False (single colored handler);
    caplog needs propagation to the root logger."""
    root = logging.getLogger("control_toolkit_tpu")
    old = root.propagate
    root.propagate = True
    yield
    root.propagate = old


def _mpc(optimizer="mppi", env="cartpole", cost=None, pred_spec=None,
         attrs=None, opt_cfg=None, n_u=1):
    cfg = {"optimizer": optimizer, "controller_logging": False}
    if cost:
        cfg["cost_function_specification"] = cost
    ctrl = MPCController(
        environment_name=env,
        control_limits=(np.full((n_u,), -1.0, np.float32),
                        np.full((n_u,), 1.0, np.float32)),
        initial_environment_attributes=attrs or {"target_position": 0.0},
        config=cfg,
    )
    kw = {}
    if pred_spec:
        kw["predictor_specification"] = pred_spec
    ctrl.configure(optimizer_name=optimizer, optimizer_config={
        "seed": 1, "mpc_timestep": 0.05, "mpc_horizon": 10,
        "num_rollouts": 64, **(opt_cfg or {}),
    }, **kw)
    return ctrl


def test_report_names_backend_on_cpu():
    ctrl = make("mppi", logging=False)
    family, path, reasons = ctrl.optimizer.kernel_path_report()
    assert family == "ode"
    assert path == "fused-scan"  # CPU tests: kernels are TPU-only
    assert any("backend" in r for r in reasons), reasons


def test_report_names_value_terminal_gradient_paths(caplog, ctt_propagate):
    """A gradient optimizer with a plain-MLP value terminal logs that V
    rides the gradient kernels IN-KERNEL (dV/dQ via the terminal vjp
    seed); an exotic (non-mlp_init-shaped) V logs WHY the kernels are
    off instead."""
    import jax
    import jax.numpy as jnp

    from control_toolkit_tpu.costs.value_terminal import (
        attach_value_terminal,
    )
    from control_toolkit_tpu.models import networks as nets

    ctrl = make("rpgd-tf", logging=False)
    vp = nets.mlp_init(jax.random.PRNGKey(0), [4, 8, 1])
    with caplog.at_level(logging.INFO,
                         logger="control_toolkit_tpu.optimizers.base"):
        attach_value_terminal(ctrl, vp)  # re-jits -> re-logs the notice
    assert ctrl.optimizer._post_terminal_fn() is not None
    assert ctrl.optimizer._value_grad_spec() == {"n_layers": 2}
    msgs = [r.message for r in caplog.records]
    assert any("gradient-kernel eligible" in m for m in msgs), msgs

    # exotic V (extra key): the kernels can't host it -> disabled notice
    ctrl.cost_function.cost_function.value_params = {
        **vp, "norm_in_mean": jnp.zeros(4)}
    assert ctrl.optimizer._value_grad_spec() is None
    caplog.clear()
    with caplog.at_level(logging.INFO,
                         logger="control_toolkit_tpu.optimizers.base"):
        ctrl.optimizer._log_kernel_path()
    msgs = [r.message for r in caplog.records]
    assert any("gradient kernels disabled" in m for m in msgs), msgs


def test_report_names_force_scan():
    ctrl = make("mppi", logging=False, force_scan=True)
    _, path, reasons = ctrl.optimizer.kernel_path_report()
    assert path == "fused-scan"
    assert any("force_scan" in r for r in reasons), reasons


def test_report_names_array_attrs():
    ctrl = _mpc(env="pointmass", cost="pointmass/trajectory", attrs={},
                n_u=2)
    _, path, reasons = ctrl.optimizer.kernel_path_report()
    assert path in ("fused-scan", "trajectory")
    # time-indexed trajectory cost: AoS override + array attrs
    assert any("AoS" in r or "array-valued" in r for r in reasons), reasons


def test_report_robust_eval_path():
    ctrl = _mpc(pred_spec="ensemble:mlp-16:4",
                opt_cfg={"robust_eval": "worst"})
    _, path, reasons = ctrl.optimizer.kernel_path_report()
    assert path == "robust-member-eval"
    assert reasons and "robust_eval" in reasons[0]


def test_report_prob_ensemble_named():
    ctrl = _mpc(pred_spec="ensemble:mlp-16:4:prob")
    _, path, reasons = ctrl.optimizer.kernel_path_report()
    assert path in ("fused-scan", "trajectory")
    assert any("prob" in r for r in reasons), reasons


def test_euler_rides_the_kernels(monkeypatch):
    """Round 4 gated euler off every Pallas kernel for a Mosaic "Invalid
    relayout" crash; round 5 root-caused it (replicated splat-init layout
    diverging through the rollout fori_loop carry on chain plants) and
    fixed it with a full-layout zero anchor in soa_integrators.euler —
    euler configs are kernel-eligible again, for the ODE family AND the
    residual family (its kernel runs the base's SOA integrator in-kernel,
    ADVICE r4)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for spec in ("ODE:euler", "ODE:rk4"):
        opt = _mpc(pred_spec=spec).optimizer
        opt._device = None
        assert opt._pallas_compatible_model(), spec
    for spec in ("ODE+res:euler", "ODE+res:rk4"):
        opt = _mpc(pred_spec=spec).optimizer
        opt._device = None
        assert opt._pallas_residual_compatible_model(), spec


def test_neural_batched_grad_gate_is_measurement_driven(monkeypatch):
    """Round-5 recheck (docs/KERNELS.md §6): the batched NEURAL gradient
    kernel loses to the vmapped XLA-AD scan at per-slot K=32, is neutral
    at 128 and wins at 512 — `_grad_kernel_model_ok` engages it only at
    per-slot K >= 128.  ODE/residual models stay unconditionally
    eligible (their kernels win at every measured K)."""
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for k, want in ((32, False), (64, False), (128, True), (512, True)):
        opt = _mpc(pred_spec="neural:mlp-16",
                   opt_cfg={"num_rollouts": k}).optimizer
        opt._device = None
        assert opt._grad_kernel_model_ok() is want, (k, want)
        # per-slot dyn never composes with shared-operand neural weights
        assert opt._grad_kernel_model_ok(has_per_slot_dyn=True) is False, k
    for k in (32, 512):
        opt = _mpc(pred_spec="ODE:rk4",
                   opt_cfg={"num_rollouts": k}).optimizer
        opt._device = None
        assert opt._grad_kernel_model_ok() is True, k


def test_configure_logs_one_info_line(caplog, ctt_propagate):
    with caplog.at_level(logging.INFO,
                         logger="control_toolkit_tpu.optimizers.base"):
        make("mppi", logging=False)
    assert any("rollout-cost path" in r.message for r in caplog.records)
