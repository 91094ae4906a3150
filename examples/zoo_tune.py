"""Coarse hyper-probe sweep behind `zoo_eval.TUNED`.

The first full zoo table run exposed cells whose realized closed-loop
cost was WORSE than random action — hyper artifacts, not algorithm
truth.  This script records the probe sweep that fixed them: each bad
cell gets a handful of single-hyper overrides, evaluated with
`zoo_eval.eval_cell` (same seeds / episode starts / budget as the
table), and the winners were copied into `zoo_eval.TUNED`.

Measured on TPU (probe results, J = mean realized cost over 8 episodes):

  cartpole/mppi        LBD 100 -> 1e3:   2391972 -> 783881
                       (1e4: 2296026, 1e5: 2669923 — 1e3 is the basin)
  cartpole/cem-tf      stdev 0.5/min .01 -> 1.0/.2: 9978472 -> 1093520
  cartpole/icem-tf     same override:    5431703 -> 846087
  pendulum/mppi-var    STDEV_min .01 -> .2: 23264 -> 20173
  quadrotor/mppi       LBD 3 -> 30:      2044 -> 474  (300: 48905)
  quadrotor/mppi-var   STDEV_min .01 -> .1: 268916 -> 404
  cartpole/cem-gmm-tf  stdev 1.0/.2:     14575911 -> 937220
  quadrotor/mppi-optimize LBD 3 -> 30:   1063 -> 374
  quadrotor/cem-naive-grad lr .1 -> .02, clip 2: 1036 -> 291
  pointmass/mppi-var   STDEV_min .01 -> .1: 6655 -> 1604

Acrobot (5th task column): NO probe helps the MPPI family — LBD
{2, 5, 20, 50} span 3.1k-3.9k, SQRTRHOINV 0.3 3.97k, mppi-var floors
3.8k-4.9k, all worse than random action's 2.4k. Algorithm-level
negative: softmax plan averaging cancels on the chaotic double
pendulum; elite (CEM 1.95k) and gradient (RPGD 1.28k, iLQR 1.11k)
methods handle it.

Probed but NOT adopted: cartpole mppi-var stdev floors (0.1: 2.32M,
0.2: 4.27M vs 1.23M default) or LBD_mc=1e3+floor (1.61M /
2.43M vs 1.23M default), cartpole mppi-optimize LBD=1e3 (1.61M vs
1.27M), cartpole cem-naive-grad stdev widening (1.96M ~= default), and
pendulum mppi-var LR slowdowns (~20.0-20.2k vs 20.2k with the floor
alone — variance adaptation just hurts on pendulum at this budget).

Lesson recorded in docs/TUNING.md: MPPI's temperature LBD must scale
with the task's stage-cost magnitude (exp(-cost/LBD) weights degenerate
to winner-take-all when typical rollout costs >> LBD), and CEM /
MPPI-var stdev floors of 0.01 collapse exploration before a swing-up
completes.

Run (one patient detached process on TPU):

    python examples/zoo_tune.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import zoo_eval as Z
from control_toolkit_tpu.utils.compile_cache import enable_persistent_cache

CASES = [
    # cartpole MPPI: LBD=100 is winner-take-all at J~1e6 scale.
    ("cartpole-swingup", "mppi", {"LBD": 1e3}),
    ("cartpole-swingup", "mppi", {"LBD": 1e4}),
    ("cartpole-swingup", "mppi", {"LBD": 1e5}),
    ("cartpole-swingup", "mppi", {"LBD": 1e4, "SQRTRHOINV": 0.15}),
    # cartpole CEM family: stdev_min 0.01 collapses exploration.
    ("cartpole-swingup", "cem-tf",
     {"cem_initial_action_stdev": 1.0, "cem_stdev_min": 0.2}),
    ("cartpole-swingup", "cem-tf",
     {"cem_initial_action_stdev": 0.5, "cem_stdev_min": 0.1,
      "cem_best_k": 32}),
    ("cartpole-swingup", "icem-tf",
     {"cem_initial_action_stdev": 1.0, "cem_stdev_min": 0.2}),
    ("cartpole-swingup", "cem-gmm-tf",
     {"cem_initial_action_stdev": 1.0, "cem_stdev_min": 0.2}),
    ("cartpole-swingup", "cem-naive-grad-tf",
     {"cem_initial_action_stdev": 1.0, "cem_stdev_min": 0.2}),
    # cartpole mppi-var / mppi-optimize: apply the LBD=1e3 lesson.
    ("cartpole-swingup", "mppi-var-tf", {"LBD_mc": 1e3, "STDEV_min": 0.1}),
    ("cartpole-swingup", "mppi-var-tf", {"LBD_mc": 1e3, "STDEV_min": 0.2}),
    ("cartpole-swingup", "mppi-optimize-tf", {"LBD": 1e3}),
    # pendulum mppi-var: variance adaptation collapse.
    ("pendulum-swingup", "mppi-var-tf", {"STDEV_min": 0.2}),
    ("pointmass-obstacle", "mppi-var-tf", {"STDEV_min": 0.1}),
    ("pointmass-obstacle", "mppi-var-tf", {"STDEV_min": 0.05, "LR": 0.2}),
    ("cartpole-swingup", "mppi-var-tf", {"STDEV_min": 0.1}),
    ("cartpole-swingup", "mppi-var-tf", {"STDEV_min": 0.2}),
    ("pendulum-swingup", "mppi-var-tf", {"STDEV_min": 0.1, "LR": 0.2}),
    ("pendulum-swingup", "mppi-var-tf", {"STDEV_min": 0.2, "LR": 0.1}),
    ("pendulum-swingup", "mppi-var-tf",
     {"STDEV_min": 0.2, "LR": 0.05, "STDEV_max": 1.0}),
    # acrobot mppi family: every probe stayed worse than random (see
    # module docstring — algorithm-level negative, no override adopted).
    ("acrobot-swingup", "mppi", {"LBD": 2.0}),
    ("acrobot-swingup", "mppi", {"LBD": 5.0}),
    ("acrobot-swingup", "mppi", {"LBD": 50.0}),
    ("acrobot-swingup", "mppi", {"SQRTRHOINV": 0.3}),
    ("acrobot-swingup", "mppi", {"LBD": 5.0, "SQRTRHOINV": 0.3}),
    ("acrobot-swingup", "mppi-var-tf", {"STDEV_min": 0.2}),
    ("acrobot-swingup", "mppi-var-tf", {"STDEV_min": 0.1, "LBD_mc": 5.0}),
    # quadrotor mppi: LBD=3 over-smooths hover costs ~ hundreds.
    ("quadrotor3d-hover", "mppi", {"LBD": 30.0}),
    ("quadrotor3d-hover", "mppi", {"LBD": 300.0}),
    ("quadrotor3d-hover", "mppi", {"LBD": 30.0, "SQRTRHOINV": 0.15}),
    ("quadrotor3d-hover", "mppi-var-tf", {"STDEV_min": 0.1}),
    ("quadrotor3d-hover", "mppi-var-tf", {"STDEV_min": 0.1, "LR": 0.2}),
    ("quadrotor3d-hover", "mppi-optimize-tf", {"LBD": 30.0}),
    ("quadrotor3d-hover", "cem-naive-grad-tf",
     {"learning_rate": 0.02, "gradmax_clip": 2}),
]


def main():
    enable_persistent_cache()
    for tname, oname, override in CASES:
        task = Z.TASKS[tname]
        cfg, _budget = Z.optimizer_configs(task)[oname]
        cfg = {**cfg, **override}
        t0 = time.time()
        try:
            mean, sd, _ms = Z.eval_cell(task, oname, cfg)
            print(f"{tname}/{oname} {override}: J={mean:.1f} +/- {sd:.1f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tname}/{oname} {override}: ERROR {e}", flush=True)


if __name__ == "__main__":
    main()
