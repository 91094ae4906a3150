"""Learned terminal value: short-horizon MPC with long-horizon foresight.

The MBVE / TD-MPC recipe on stock toolkit surface (costs/value_terminal.py):

1. collect episodes with an expert policy (here an LQR with exploration
   noise) and record the realized per-tick stage costs,
2. turn them into discounted cost-to-go targets
   (``models.training.discounted_cost_to_go``) and fit a value net
   (``models.training.fit_value_mlp``); then run ONE fitted-value-
   iteration round — refit with the first net bootstrapping the
   truncated episode tails (``tail_value=V(x_T)``), the dominant error
   of the one-pass recipe (round-5 probe: best learnable combo is
   gamma 0.99 + long episodes + one VI round; a DAgger round HURT),
3. wrap the planner's cost so ``terminal += V(x_H)``
   (``ValueTerminalCost``) — the myopic H=3 MPPI now ranks plans by
   ``sum(stage costs) + V(x_H)``, i.e. with the expert's foresight.

Why this matters on TPU: K (rollouts) parallelizes over the chip, but the
horizon H is a sequential ``lax.scan`` — amortizing horizon into a value
net is a latency/throughput lever, not just a quality trick.  Re-fitted
nets hot-swap as jit arguments (``update_value_params``) with zero
recompiles.

    python examples/value_mpc.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas

import jax.numpy as jnp
import numpy as np

from control_toolkit_tpu.costs.base import CostFunction
from control_toolkit_tpu.costs.value_terminal import ValueTerminalCost
from control_toolkit_tpu.models.dynamics import soa_to_aos
from control_toolkit_tpu.models.predictors import ODEPredictor
from control_toolkit_tpu.models.training import (
    discounted_cost_to_go, fit_value_mlp,
)
from control_toolkit_tpu.optimizers.mppi import MPPIOptimizer

DT = 0.1


class PosCost(CostFunction):
    """Position-only stage cost — myopia genuinely hurts: a short horizon
    never sees the velocity it is building up."""
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
    # rk4, NOT euler: euler on this 2-state plant crashes Mosaic in the
    # semi-fused MPPI kernel on TPU (recorded negative, CLAUDE.md); rk4
    # is exact for a linear system anyway.
    return ODEPredictor(dynamics=soa_to_aos(derivs_soa, 2, 1), num_states=2,
                        num_control_inputs=1, dt=DT, integrator="rk4",
                        params={})


def lqr_gain():
    A = np.array([[1, DT], [0, 1]], np.float64)
    B = np.array([[0], [DT]], np.float64)
    Q, R = np.diag([1.0, 1e-3]), np.array([[0.1]])
    P = Q.copy()
    for _ in range(500):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
    return np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A).astype(np.float32)


def make_mppi(cost, horizon, seed=7):
    pred = make_plant()
    opt = MPPIOptimizer(
        predictor=pred, cost_function=cost,
        control_limits=(np.array([-2.0], np.float32),
                        np.array([2.0], np.float32)),
        optimizer_logging=False, seed=seed, mpc_horizon=horizon,
        num_rollouts=256, cc_weight=0.0, R=1.0, LBD=10.0, NU=1000.0,
        SQRTRHOINV=0.4, period_interpolation_inducing_points=1,
    )
    opt.configure(num_states=2, num_control_inputs=1, dt=DT)
    return opt


def realized_cost(opt, plant, cost, s0, ticks=40):
    cp = cost.current_params()
    dynp = plant.default_params()
    x = jnp.asarray(s0, jnp.float32)[None]
    total, u_prev = 0.0, jnp.zeros((1, 1), jnp.float32)
    for _ in range(ticks):
        u = jnp.reshape(jnp.asarray(opt.step(np.asarray(x[0]))), (1, 1))
        total += float(cost.stage_cost_step(
            x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0])
        x = plant.single_step(x, u, dynp)
        u_prev = u
    return total


def main():
    plant, base = make_plant(), PosCost()
    cp = base.current_params()
    dynp = plant.default_params()
    K = lqr_gain()
    rng = np.random.default_rng(0)

    print("1) collecting noisy-LQR expert episodes ...")
    episodes = []  # [(ep_states [T,S], ep_stage_costs [T], x_T)]
    for s0 in [(a, b) for a in (-1.5, -0.75, 0.0, 0.75, 1.5)
               for b in (-1.0, 0.0, 1.0)]:
        x = jnp.asarray(s0, jnp.float32)[None]
        u_prev = jnp.zeros((1, 1), jnp.float32)
        ep_s, ep_g = [], []
        for _ in range(120):  # long episodes shrink the truncated tail
            u = jnp.clip(-(x @ jnp.asarray(K).T) + 0.3 * rng.normal(), -2, 2)
            ep_g.append(float(base.stage_cost_step(
                x, u, u_prev, {"cost": cp["cost"], "attrs": {}})[0]))
            ep_s.append(np.asarray(x[0]))
            x = plant.single_step(x, u, dynp)
            u_prev = u
        episodes.append((np.stack(ep_s), np.asarray(ep_g), np.asarray(x[0])))

    def fit(vprev=None):
        from control_toolkit_tpu.models.networks import mlp_apply
        states, ctgs = [], []
        for ep_s, ep_g, x_T in episodes:
            tail = 0.0 if vprev is None else max(0.0, float(
                mlp_apply(vprev, jnp.asarray(x_T)[None])[0, 0]))
            states.append(ep_s)
            ctgs.append(discounted_cost_to_go(ep_g, gamma=0.99,
                                              tail_value=tail))
        return fit_value_mlp(np.concatenate(states), np.concatenate(ctgs),
                             hiddens=(32, 32), epochs=2000,
                             learning_rate=3e-3, seed=2)

    print("2) fitting V(x) on the discounted cost-to-go ...")
    vparams, mse = fit()
    print(f"   value-net MSE (raw units): {mse:.4f}")
    print("2b) one fitted-value-iteration round (V bootstraps the tails) ...")
    vparams, mse = fit(vprev=vparams)
    print(f"   value-net MSE (raw units): {mse:.4f}")

    print("3) myopic H=3 MPPI, with vs without the learned terminal:")
    plain = make_mppi(PosCost(), horizon=3)
    valued = make_mppi(ValueTerminalCost(PosCost(), vparams), horizon=3)
    tot_p = tot_v = 0.0
    for s0 in ([1.4, -0.6], [-1.0, 0.9], [0.5, 1.2]):
        plain.optimizer_reset()
        valued.optimizer_reset()
        jp = realized_cost(plain, plant, base, s0)
        jv = realized_cost(valued, plant, base, s0)
        tot_p += jp
        tot_v += jv
        print(f"   start {s0}: plain {jp:8.2f}   + learned V {jv:8.2f}")
    print(f"   aggregate: plain {tot_p:.2f}  + learned V {tot_v:.2f} "
          f"({100 * (1 - tot_v / tot_p):.0f}% lower realized cost)")


if __name__ == "__main__":
    main()
