import sys
sys.path.insert(0, "/root/repo/examples")
from zoo_eval import TASKS, optimizer_configs, eval_cell
task = TASKS["acrobot-swingup"]
base, _ = optimizer_configs(task)["mppi"]
for pip, w in ((2, "rank:0.1"), (2, "softmax"), (5, "rank:0.1"),
               (1, "rank:0.1"), (2, "rank:0.03")):
    cfg = {**base, "weighting": w,
           "period_interpolation_inducing_points": pip}
    mean, sd, ms = eval_cell(task, "mppi", cfg)
    print(f"mppi pip={pip} {w:9s}: J = {mean:9.1f} +/- {sd:8.1f}", flush=True)
