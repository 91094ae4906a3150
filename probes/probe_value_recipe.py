"""CPU prototype: close the value-terminal myopia gap (VERDICT r5 #4).

Bench recipe (bench_scale.measure_value_terminal): double integrator,
position-only cost, H=50 plain vs H=3 plain vs H=3+V.  Round-4 result:
H=3+V recovers only 38% of the gap (151 vs 55/244 on TPU at K=16k).

Candidate recipes compared here at K=1024 on CPU:
  r0      : round-4 recipe (noisy-LQR ctg, gamma=0.97, one pass)
  long    : gamma=0.99, 120-step episodes (less truncation bias)
  boot    : 'long' + one fitted-VI round (refit on targets bootstrapped
            with the previous V at episode truncation)
  dagger  : 'boot' + on-policy episodes collected UNDER H=3+V itself
  oracle  : MLP fit on the analytic DARE cost-to-go on a grid — the
            achievable ceiling for this planner/eval (diagnostic only)
"""
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.costs.value_terminal import ValueTerminalCost
from control_toolkit_tpu.models.dynamics import soa_to_aos
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.models.training import (
    discounted_cost_to_go, fit_value_mlp,
)
from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

DT, K = 0.1, 1024


class PosCost(CostFunction):
    dynamic_config_keys = ("r",)

    def __init__(self, config=None):
        super().__init__({"r": 0.1, **(config or {})})

    def _stage_cost_core_soa(self, xs, us, params):
        return (0.5 * xs[0] * xs[0]
                + 0.5 * params["cost"]["r"] * sum(u * u for u in us))


def make_plant():
    def derivs_soa(xs, us, p):
        pos, vel = xs
        return (vel, us[0])
    return ODEPredictor(dynamics=soa_to_aos(derivs_soa, 2, 1),
                        num_states=2, num_control_inputs=1, dt=DT,
                        integrator="rk4", params={})


def make_mppi(cost, horizon):
    opt = MPPIOptimizer(
        predictor=make_plant(), cost_function=cost,
        control_limits=(np.array([-2.0], np.float32),
                        np.array([2.0], np.float32)),
        optimizer_logging=False, seed=7, mpc_horizon=horizon,
        num_rollouts=K, cc_weight=0.0, R=1.0, LBD=10.0, NU=1000.0,
        SQRTRHOINV=0.4, period_interpolation_inducing_points=1,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=DT)
    return opt


plant, base = make_plant(), PosCost()
cp = base.current_params()
dynp = plant.default_params()

A = np.array([[1, DT], [0, 1]], np.float64)
Bm = np.array([[0], [DT]], np.float64)
Qlqr, Rlqr = np.diag([1.0, 1e-3]), np.array([[0.1]])
P = Qlqr.copy()
for _ in range(500):
    Kg = np.linalg.solve(Rlqr + Bm.T @ P @ Bm, Bm.T @ P @ A)
    P = Qlqr + A.T @ P @ (A - Bm @ Kg)
Kg = np.linalg.solve(Rlqr + Bm.T @ P @ Bm, Bm.T @ P @ A).astype(np.float32)


def expert_episodes(T, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    eps = []
    for s0 in [(a, b) for a in (-1.5, -0.75, 0.0, 0.75, 1.5)
               for b in (-1.0, 0.0, 1.0)]:
        x = jnp.asarray(s0, jnp.float32)[None]
        u_prev = jnp.zeros((1, 1), jnp.float32)
        ep_s, ep_g = [], []
        for _ in range(T):
            u = jnp.clip(-(x @ jnp.asarray(Kg).T) + noise * rng.normal(),
                         -2.0, 2.0)
            ep_g.append(float(base.stage_cost_step(
                x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0]))
            ep_s.append(np.asarray(x[0]))
            x = plant.single_step(x, u, dynp)
            u_prev = u
        eps.append((np.stack(ep_s), np.asarray(ep_g), np.asarray(x[0])))
    return eps


def policy_episodes(opt, T, seed=0, starts=None):
    """Episodes under the CONTROLLER itself (DAgger round)."""
    rng = np.random.default_rng(seed)
    eps = []
    starts = starts or [(a, b) for a in (-1.5, -0.75, 0.0, 0.75, 1.5)
                        for b in (-1.0, 0.0, 1.0)]
    for s0 in starts:
        opt.optimizer_reset()
        x = jnp.asarray(s0, jnp.float32)[None]
        u_prev = jnp.zeros((1, 1), jnp.float32)
        ep_s, ep_g = [], []
        for _ in range(T):
            u = jnp.reshape(jnp.asarray(opt.step(np.asarray(x[0]))), (1, 1))
            ep_g.append(float(base.stage_cost_step(
                x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0]))
            ep_s.append(np.asarray(x[0]))
            x = plant.single_step(x, u, dynp)
            u_prev = u
        eps.append((np.stack(ep_s), np.asarray(ep_g), np.asarray(x[0])))
    return eps


def v_eval(vparams, x):
    from control_toolkit_tpu.models.networks import mlp_apply
    return float(mlp_apply(vparams, jnp.asarray(x, jnp.float32)[None])[0, 0])


def fit_from(eps, gamma, vprev=None, extra=None, seed=2, epochs=2000):
    xs, ys = [], []
    for ep_s, ep_g, x_T in eps:
        tail = max(0.0, v_eval(vprev, x_T)) if vprev is not None else 0.0
        xs.append(ep_s)
        ys.append(discounted_cost_to_go(ep_g, gamma=gamma, tail_value=tail))
    if extra:
        xs.append(extra[0]); ys.append(extra[1])
    return fit_value_mlp(np.concatenate(xs), np.concatenate(ys),
                         hiddens=(32, 32), epochs=epochs,
                         learning_rate=3e-3, seed=seed)


def realized(opt, ticks=40):
    total = 0.0
    for s0 in ([1.4, -0.6], [-1.0, 0.9], [0.5, 1.2]):
        opt.optimizer_reset()
        x = jnp.asarray(s0, jnp.float32)[None]
        u_prev = jnp.zeros((1, 1), jnp.float32)
        for _ in range(ticks):
            u = jnp.reshape(jnp.asarray(opt.step(np.asarray(x[0]))), (1, 1))
            total += float(base.stage_cost_step(
                x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0])
            x = plant.single_step(x, u, dynp)
            u_prev = u
    return total


def row(name, opt):
    print(f"{name:28s}: J = {realized(opt):9.3f}", flush=True)


row("H=50 plain", make_mppi(PosCost(), 50))
row("H=3  plain", make_mppi(PosCost(), 3))

# r0: round-4 recipe
eps60 = expert_episodes(T=60)
v_r0, mse0 = fit_from(eps60, gamma=0.97)
row("H=3 + V r0 (g0.97 T60)", make_mppi(ValueTerminalCost(PosCost(), v_r0), 3))

# long: gamma 0.99, T=120
eps120 = expert_episodes(T=120, seed=1)
v_long, _ = fit_from(eps120, gamma=0.99)
row("H=3 + V long (g0.99 T120)",
    make_mppi(ValueTerminalCost(PosCost(), v_long), 3))

# boot: one fitted-VI round on the same data
v_boot, _ = fit_from(eps120, gamma=0.99, vprev=v_long, seed=3)
row("H=3 + V boot (VI round)",
    make_mppi(ValueTerminalCost(PosCost(), v_boot), 3))

# dagger: collect under H=3+V(boot), bootstrap with v_boot, refit on both
ctrl = make_mppi(ValueTerminalCost(PosCost(), v_boot), 3)
eps_pi = policy_episodes(ctrl, T=120, seed=4)
v_dag, _ = fit_from(eps120 + eps_pi, gamma=0.99, vprev=v_boot, seed=5)
row("H=3 + V dagger", make_mppi(ValueTerminalCost(PosCost(), v_dag), 3))

# oracle ceiling: DARE V* for THIS stage cost (Q=diag(1,0), R=0.1),
# V*(x) = 0.5 x'Px, fit an MLP on a dense grid of analytic targets.
Qc, Rc = np.diag([1.0, 0.0]), np.array([[0.1]])
Pc = np.diag([1.0, 0.1])
for _ in range(2000):
    Kc = np.linalg.solve(Rc + Bm.T @ Pc @ Bm, Bm.T @ Pc @ A)
    Pc = Qc + A.T @ Pc @ (A - Bm @ Kc)
gx = np.stack(np.meshgrid(np.linspace(-3, 3, 61),
                          np.linspace(-3, 3, 61)), -1).reshape(-1, 2)
gy = 0.5 * np.einsum("ni,ij,nj->n", gx, Pc, gx)
v_orc, mse_o = fit_value_mlp(gx.astype(np.float32), gy.astype(np.float32),
                             hiddens=(32, 32), epochs=4000,
                             learning_rate=3e-3, seed=6)
row("H=3 + V oracle (DARE fit)",
    make_mppi(ValueTerminalCost(PosCost(), v_orc), 3))
print("done", flush=True)

# --- horizon sweep under the boot and oracle V: where does H+V reach
# within 25% of H=50?  (the planner, not the fit, limits H=3)
for Hs in (6, 10, 16):
    row(f"H={Hs} plain", make_mppi(PosCost(), Hs))
    row(f"H={Hs} + V boot", make_mppi(ValueTerminalCost(PosCost(), v_boot), Hs))
    row(f"H={Hs} + V oracle", make_mppi(ValueTerminalCost(PosCost(), v_orc), Hs))
