"""Optimizer/controller state checkpointing.

The reference has no checkpoint/resume (SURVEY §5) — its warm starts live
only inside a run.  Here optimizer state is a pure pytree, so save/restore
is flatten -> npz (or any orbax-compatible store).  Keys encode the tree
path; restore rebuilds into the template's structure.
"""
from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import numpy as np


def _flatten(state: Any):
    leaves, treedef = jax.tree_util.tree_flatten(state)
    return leaves, treedef


def save_state(path, state: Any) -> None:
    """Save any pytree of arrays to an .npz file."""
    leaves, _ = _flatten(state)
    np.savez(
        path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    )


def load_state(path, template: Any) -> Any:
    """Load a pytree saved by save_state, shaped like ``template``."""
    data = np.load(path)
    t_leaves, treedef = _flatten(template)
    leaves = []
    for i, t_leaf in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        t_arr = np.asarray(t_leaf)
        if arr.shape != t_arr.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {t_arr.shape}"
            )
        leaves.append(jax.numpy.asarray(arr.astype(t_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_optimizer(path, optimizer) -> None:
    """Checkpoint an optimizer's full warm-start state (population,
    distribution moments, Adam m/v, PRNG key, counters, u_prev)."""
    save_state(path, optimizer.opt_state)


def load_optimizer(path, optimizer) -> None:
    if optimizer.opt_state is None:
        raise RuntimeError("optimizer not configured; call configure() first")
    state = load_state(path, optimizer.opt_state)
    if optimizer._shard_state is not None:
        state = optimizer._shard_state(state)
    optimizer.opt_state = state


def save_controller(path, controller) -> None:
    """Checkpoint an MPC controller: optimizer state + variable parameters."""
    payload = {
        "opt_state": controller.optimizer.opt_state,
        "attrs": dict(controller.variable_parameters),
    }
    save_state(path, payload)


def load_controller(path, controller) -> None:
    template = {
        "opt_state": controller.optimizer.opt_state,
        "attrs": dict(controller.variable_parameters),
    }
    payload = load_state(path, template)
    controller.optimizer.opt_state = payload["opt_state"]
    controller.variable_parameters.update(payload["attrs"])
