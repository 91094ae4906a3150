"""Learned warm starts: amortize the optimizer with a cloned policy.

The "learning to optimize MPC" recipe (e.g. arxiv 2212.02603): run an
EXPENSIVE expert MPC offline, behavior-clone its solutions into a tiny
policy net, then hand that net to a CHEAP online optimizer as its initial
guess — the optimizer only refines a near-optimal plan instead of
discovering one from scratch.  Everything here is stock toolkit surface:

1. expert RPGD (8 Adam iterations/step) collects demonstrations,
2. ``fit_policy`` clones them (models/training.py),
3. the net rides ``Optimizer(initial_guess_policy=...)`` — the same hook
   the reference uses for FORCES' heuristic warm start
   (optimizer_nlp_forces.py:261-279), here fed by a LEARNED policy —
   seeding a 1-iteration RPGD's population at every reset.

The printout compares the cheap optimizer's cold-start transient with and
without the learned seed across fresh starts (the warm start pays exactly
where warm-start shifting can't help: the first ticks after a reset).

    python examples/learned_warmstart.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import jax

jax.config.update("jax_platforms", "cpu")  # demos pin CPU; see CLAUDE.md gotchas

import numpy as np

from control_toolkit_tpu import import_controller_by_name
from control_toolkit_tpu.environments.cartpole import CartpoleEnv
from control_toolkit_tpu.models import networks as nets
from control_toolkit_tpu.models.training import fit_policy

DT = 0.02
RPGD_BASE = {
    "seed": 3, "mpc_timestep": DT, "mpc_horizon": 25,
    "SAMPLING_DISTRIBUTION": "uniform",
    "period_interpolation_inducing_points": 5, "learning_rate": 0.05,
    "gradmax_clip": 5, "rtol": 1e-3, "opt_keep_k_ratio": 0.25,
    "resamp_per": 10, "sample_stdev": 0.5, "sample_mean": 0.0,
    "sample_whole_control_space": True, "uniform_dist_min": -1.0,
    "uniform_dist_max": 1.0, "warmup": False, "warmup_iterations": 0,
}


def make_ctrl(outer_its, num_rollouts, policy=None):
    Ctrl = import_controller_by_name("mpc")
    ctrl = Ctrl(
        "cartpole",
        control_limits=(np.array([-1.0], np.float32), np.array([1.0], np.float32)),
        initial_environment_attributes={"target_position": 0.0},
        config={"optimizer": "rpgd-tf", "controller_logging": False},
    )
    cfg = dict(RPGD_BASE, outer_its=outer_its, num_rollouts=num_rollouts)
    if policy is not None:
        cfg["initial_guess_policy"] = policy
    ctrl.configure(optimizer_name="rpgd-tf", optimizer_config=cfg)
    return ctrl


def transient_cost(ctrl, s0, ticks=40):
    env = CartpoleEnv(batch_size=1, dt=DT, seed=9)
    env.reset()
    env.state = np.asarray(s0[None], np.float32)
    s = env.state
    ctrl.controller_reset()  # fresh start: re-arms the policy seed
    cost = 0.0
    for _ in range(ticks):
        u = ctrl.step(s[0])
        s, *_ = env.step(u)
        cost += float(20.0 * s[0, 2] ** 2 + 0.5 * s[0, 0] ** 2 + 0.1 * u[0] ** 2)
    return cost


def main() -> None:
    # 1. expensive expert MPC -> demonstrations from HARD starts (pole far
    # from upright) so the clone covers the recovery regime.
    expert = make_ctrl(outer_its=8, num_rollouts=64)
    env = CartpoleEnv(batch_size=1, dt=DT, seed=0)
    rng = np.random.default_rng(0)
    states, controls = [], []
    for ep in range(8):
        env.reset(seed=ep)
        env.state = np.array([[rng.uniform(-0.5, 0.5), rng.uniform(-0.3, 0.3),
                               rng.uniform(-1.0, 1.0), rng.uniform(-0.5, 0.5)]],
                             np.float32)
        expert.controller_reset()
        s = env.state
        for _ in range(40):
            u = expert.step(s[0])
            states.append(s[0].copy())
            controls.append(np.asarray(u).reshape(-1).copy())
            s, *_ = env.step(u)
    states, controls = np.stack(states), np.stack(controls)
    print(f"expert demos: {len(states)} (state, control) pairs")

    # 2. clone into a tiny policy net
    pi, mse = fit_policy(states, controls, hiddens=(32, 32), epochs=3000, seed=1)
    print(f"policy clone MSE {mse:.2e}")

    def learned_policy(x, params):
        return nets.mlp_apply(pi, x)

    # 3. cheap online optimizer, cold vs learned-warm-started
    cold = make_ctrl(outer_its=1, num_rollouts=8)
    warm = make_ctrl(outer_its=1, num_rollouts=8, policy=learned_policy)

    # Hard starts (pole far from upright): a 1-iteration cold optimizer
    # must discover the recovery plan from random sequences; the learned
    # seed hands it one.
    starts = [
        np.array([0.3, 0.0, 0.8, 0.0], np.float32),
        np.array([-0.4, 0.2, -0.9, 0.5], np.float32),
        np.array([0.0, -0.3, 1.0, -0.4], np.float32),
        np.array([0.5, 0.0, -0.7, -0.6], np.float32),
    ]
    tot_cold = tot_warm = 0.0
    for i, s0 in enumerate(starts):
        c = transient_cost(cold, s0)
        w = transient_cost(warm, s0)
        tot_cold += c; tot_warm += w
        print(f"start {i}: cold-start transient cost {c:7.2f}  "
              f"learned warm start {w:7.2f}  ({(1 - w / c) * 100:+.0f}%)")
    print(f"TOTAL: cold {tot_cold:.2f} vs warm {tot_warm:.2f} "
          f"({(1 - tot_warm / tot_cold) * 100:+.0f}%)")
    assert tot_warm < tot_cold, "learned warm start should beat cold start"
    print("LEARNED WARMSTART OK")


if __name__ == "__main__":
    main()
