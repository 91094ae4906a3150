"""On-device hyperparameter grid search over closed-loop episodes.

The reference tunes controllers by hand — edit the YAML, rerun the sim,
watch the plot (Cost_Functions/cost_function_tester.py is its whole tuning
tooling).  TPU-native answer: every candidate configuration is one more
episode in a ``ClosedLoop.run_batch`` parameter sweep, so an entire grid —
cost weights x targets x model constants, each replicated over Monte-Carlo
episodes — is evaluated in ONE device launch and ranked by realized
closed-loop cost.

Two parameter kinds, matching the architecture invariant (CLAUDE.md):

- **Swept** (``grid``): values that are jit ARGUMENTS — cost weights,
  environment attributes, dynamics constants.  The whole grid is extra
  episodes of one program; zero recompiles.
- **Static** (``static_grid`` + ``build_loop``): values baked into the
  compiled step — optimizer hyperparameters (LBD, sampling stdev, K, H).
  Each combination rebuilds the controller (one compile per value
  combination, honestly paid); the swept grid rides inside each rebuild.

Two scoring modes, because sweeping COST parameters changes the metric
itself:

- ``score='swept'`` (default): rank by the realized stage cost each episode
  computed with ITS OWN parameters — right for robustness studies (sweep
  targets or controller-side dynamics constants; the metric definition is
  shared).
- ``score='fixed'``: re-score every trajectory under the controller's BASE
  cost parameters — right for tuning cost/optimizer weights, where each
  config must be judged by one common yardstick, not its own reshaped
  objective.
"""
from __future__ import annotations

import itertools
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _nest(flat: Dict[str, np.ndarray]) -> Dict:
    """{'cost.cost_weight': v, ...} -> nested overlay dict."""
    out: Dict = {}
    for dotted, v in flat.items():
        node = out
        *parents, leaf = dotted.split(".")
        for p in parents:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(
                    f"grid path '{dotted}' conflicts with a shorter path"
                )
        if leaf in node:
            raise ValueError(f"duplicate grid path '{dotted}'")
        node[leaf] = v
    return out


def _combos(grid: Dict[str, np.ndarray]):
    """(paths, value arrays, index combos in itertools.product order)."""
    paths = list(grid)
    values: List[np.ndarray] = [np.asarray(grid[p]) for p in paths]
    for p, v in zip(paths, values):
        if v.ndim == 0 or v.shape[0] == 0:
            raise ValueError(f"grid['{p}'] must be a non-empty value array")
    combos = list(itertools.product(*[range(len(v)) for v in values]))
    return paths, values, combos


def _swept_eval(loop, grid, s0, ticks, E, score, mesh):
    """One device launch over the swept cross product; returns
    (config dicts, per-config mean costs)."""
    if grid:
        paths, values, combos = _combos(grid)
        C = len(combos)
        N = C * E
        sweep_flat = {}
        for j, p in enumerate(paths):
            rows = values[j][np.asarray([c[j] for c in combos])]  # [C, ...]
            sweep_flat[p] = np.repeat(rows, E, axis=0)            # [N, ...]
        sweep = _nest(sweep_flat)
        configs = [
            {p: values[j][c[j]] for j, p in enumerate(paths)} for c in combos
        ]
    else:
        C, N, sweep = 1, E, None
        configs = [{}]
    s0_batch = np.tile(np.reshape(np.asarray(s0, np.float32), (1, -1)), (N, 1))
    out = loop.run_batch(
        s0_batch, ticks, sweep_params=sweep, mesh=mesh,
        return_trajectories=(score == "fixed"),
    )
    if score == "fixed":
        costs = _rescore_fixed(loop, out["states"], out["controls"])
    else:
        costs = out["mean_costs"]
    return configs, np.asarray(costs).reshape(C, E).mean(axis=1)


def grid_search(
    loop,
    grid: Dict[str, np.ndarray],
    s0: np.ndarray,
    ticks: int,
    episodes_per_config: int = 1,
    score: str = "swept",
    mesh=None,
    static_grid: Optional[Dict[str, np.ndarray]] = None,
    build_loop: Optional[Callable[[Dict], object]] = None,
) -> Dict:
    """Evaluate the cross product of ``grid`` (x ``static_grid``).

    ``loop`` is a configured ``ClosedLoop``; ``grid`` maps dotted params
    paths ('cost.<weight>', 'attrs.<target>', 'dyn.<constant>') to 1-D
    value arrays (or [n_values, *leaf_shape] for vector leaves).  Every
    config runs ``episodes_per_config`` episodes from ``s0`` on
    independent PRNG streams (optimizer sampling AND actuator noise), and
    configs are ranked by the mean realized closed-loop cost.

    ``static_grid`` maps free-form names (typically optimizer-config keys
    like 'LBD') to value arrays; each static combination is evaluated on a
    fresh ``build_loop(overrides)``-built ClosedLoop (one compile per
    combination — these knobs are baked into the compiled step), with the
    swept ``grid`` riding inside it.  ``grid`` may be empty ({}) when a
    ``static_grid`` is given.  With ``static_grid``, ``loop`` may be None.

    Returns {'configs': list[dict] in grid order (static keys merged in),
    'mean_costs': [C], 'ranking': [C] indices best-first, 'best': dict,
    'best_cost': float}.
    """
    if score not in ("swept", "fixed"):
        raise ValueError(f"score must be 'swept' or 'fixed', got {score!r}")
    E = int(episodes_per_config)

    if static_grid:
        if build_loop is None:
            raise ValueError("static_grid requires build_loop(overrides)")
        s_paths, s_values, s_combos = _combos(static_grid)
        configs, costs = [], []
        for c in s_combos:
            overrides = {p: s_values[j][c[j]] for j, p in enumerate(s_paths)}
            sub_loop = build_loop(dict(overrides))
            sub_cfgs, sub_costs = _swept_eval(
                sub_loop, grid, s0, ticks, E, score, mesh
            )
            configs += [{**overrides, **sc} for sc in sub_cfgs]
            costs.append(sub_costs)
        per_cfg = np.concatenate(costs)
    else:
        if not grid:
            raise ValueError("grid is empty")
        if build_loop is not None:
            raise ValueError("build_loop is only meaningful with static_grid")
        configs, per_cfg = _swept_eval(loop, grid, s0, ticks, E, score, mesh)

    ranking = np.argsort(per_cfg, kind="stable")
    best = int(ranking[0])
    return {
        "configs": configs,
        "mean_costs": per_cfg,
        "ranking": ranking,
        "best": configs[best],
        "best_cost": float(per_cfg[best]),
    }


def _rescore_fixed(loop, states: np.ndarray, controls: np.ndarray) -> np.ndarray:
    """Mean realized stage cost of [N,T,S]/[N,T,U] trajectories under ONE
    fixed set of cost params (the controller's current assembled params) —
    the common yardstick for cost-weight tuning.  The jitted scorer is
    cached on the loop so repeated grid refinements reuse one compile."""
    cf = loop.controller.cost_function.cost_function
    params = loop.controller._assemble_params()
    p = {"cost": params["cost"], "attrs": params["attrs"]}

    # Cache keyed by the cost OBJECT: a reconfigure recreates the cost, so
    # a stale scorer would silently rank the grid under the old yardstick.
    cached = getattr(loop, "_fixed_scorer", None)
    if cached is not None and cached[0] is cf:
        score = cached[1]
    else:

        @jax.jit
        def score(ss, us, p):
            N, T, U = us.shape
            u_prev = jnp.concatenate(
                [jnp.zeros((N, 1, U), us.dtype), us[:, :-1]], axis=1
            )
            flat = cf.stage_cost_step(
                ss.reshape(N * T, -1), us.reshape(N * T, U),
                u_prev.reshape(N * T, U), p,
            )
            return jnp.mean(flat.reshape(N, T), axis=1)

        loop._fixed_scorer = (cf, score)

    return np.asarray(score(jnp.asarray(states), jnp.asarray(controls), p))
