"""TPU probe: euler integrator back on the Pallas kernels (VERDICT r5 #2).

Round-4 repro: ODE:euler on the 2-state double integrator crashed Mosaic
("Invalid relayout ... replicated in destination but not in source") in
the semi-fused MPPI kernel; euler with intermediate_steps=5 hung the
compile.  Root cause: splat-initialised state components keep a
REPLICATED vector layout through `pos' = pos + dt*vel` while others go
full, so the fori_loop carry layout diverges.  Fix: full-layout zero
anchor in soa_integrators.euler.  This probe builds (1) euler
double-integrator semi-fused MPPI, (2) euler P=5, (3) euler cartpole,
(4) euler RPGD (gradient kernel) — each compared per-step against its
force_scan twin.
"""
import numpy as np

import jax
import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.models.dynamics import soa_to_aos
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer
from control_toolkit_tpu.optimizers.rpgd import RPGDOptimizer


class PosCost(CostFunction):
    dynamic_config_keys = ("r",)

    def __init__(self, config=None):
        super().__init__({"r": 0.1, **(config or {})})

    def _stage_cost_core_soa(self, xs, us, params):
        return (0.5 * xs[0] * xs[0]
                + 0.5 * params["cost"]["r"] * sum(u * u for u in us))


def make_pred(integrator, substeps=1):
    def derivs_soa(xs, us, p):
        pos, vel = xs
        return (vel, us[0])
    return ODEPredictor(dynamics=soa_to_aos(derivs_soa, 2, 1), num_states=2,
                        num_control_inputs=1, dt=0.1, integrator=integrator,
                        intermediate_steps=substeps, params={})


def build(opt_cls, pred, force_scan, seed=7, K=2048, H=25, **kw):
    opt = opt_cls(
        predictor=pred, cost_function=PosCost(),
        control_limits=(np.array([-2.0], np.float32),
                        np.array([2.0], np.float32)),
        optimizer_logging=False, seed=seed, mpc_horizon=H,
        num_rollouts=K, force_scan=force_scan, **kw,
    )
    opt.configure(2, 1, dt=0.1)
    return opt


def one_step(opt, s):
    return np.asarray(opt.step(np.asarray(s[0]))), None


MPPI_KW = dict(cc_weight=0.0, R=1.0, LBD=10.0, NU=1000.0, SQRTRHOINV=0.4,
               period_interpolation_inducing_points=5)
RPGD_KW = dict(outer_its=2, learning_rate=0.05, opt_keep_k_ratio=0.25,
               resamp_per=10, warmup=False,
               period_interpolation_inducing_points=5)


def main():
    s = jnp.asarray([[1.3, -0.4]], jnp.float32)
    print("backend:", jax.default_backend(), flush=True)

    for name, substeps, K in (("euler-P1", 1, 2048), ("euler-P5", 5, 2048)):
        opt_k = build(MPPIOptimizer, make_pred("euler", substeps), False,
                      **MPPI_KW)
        fam, path, reasons = opt_k.kernel_path_report()
        print(f"{name}: path={path} reasons={reasons}", flush=True)
        assert path == "pallas-kernel", (path, reasons)
        u_k, _ = one_step(opt_k, s)
        opt_s = build(MPPIOptimizer, make_pred("euler", substeps), True,
                      **MPPI_KW)
        u_s, _ = one_step(opt_s, s)
        d = abs(float(u_k[0]) - float(u_s[0]))
        print(f"{name}: kernel u={u_k} scan u={u_s} |d|={d:.2e}", flush=True)
        assert d < 5e-3, (u_k, u_s)

    # euler cartpole through the stock controller path
    from control_toolkit_tpu.controllers.mpc import MPCController
    ctrl = MPCController(
        environment_name="cartpole",
        control_limits=(np.array([-1.0], np.float32),
                        np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "mppi", "controller_logging": False},
    )
    ctrl.configure(optimizer_name="mppi", predictor_specification="ODE:euler",
                   optimizer_config={
                       "seed": 3, "mpc_timestep": 0.02, "mpc_horizon": 25,
                       "num_rollouts": 2048, "cc_weight": 1.0, "R": 1.0,
                       "LBD": 100.0, "NU": 1000.0, "SQRTRHOINV": 0.05,
                       "period_interpolation_inducing_points": 5})
    fam, path, reasons = ctrl.optimizer.kernel_path_report()
    print(f"cartpole euler: path={path} reasons={reasons}", flush=True)
    u = ctrl.step(np.array([0.0, 0.0, 0.1, 0.0], np.float32))
    print(f"cartpole euler kernel step OK u={u}", flush=True)
    assert np.all(np.isfinite(u))

    # euler RPGD: gradient kernel (fwd-store/bwd-sweep body runs the
    # euler stepper in-kernel + hand-written backward)
    opt_k = build(RPGDOptimizer, make_pred("euler"), False, K=4096, **RPGD_KW)
    fam, path, reasons = opt_k.kernel_path_report()
    print(f"rpgd euler: path={path} reasons={reasons}", flush=True)
    assert path == "pallas-kernel", (path, reasons)
    u_k, _ = one_step(opt_k, s)
    opt_s = build(RPGDOptimizer, make_pred("euler"), True, K=4096, **RPGD_KW)
    u_s, _ = one_step(opt_s, s)
    d = abs(float(u_k[0]) - float(u_s[0]))
    print(f"rpgd euler: kernel u={u_k} scan u={u_s} |d|={d:.2e}", flush=True)
    assert d < 5e-3, (u_k, u_s)
    print("EULER PROBE: ALL OK", flush=True)


if __name__ == "__main__":
    main()
