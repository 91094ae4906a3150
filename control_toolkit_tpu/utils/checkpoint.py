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
    """Save any pytree of arrays to an .npz file.

    Alongside the leaves we record the leaf count and the treedef string so
    a checkpoint from a *different* state structure (e.g. another optimizer
    whose leading leaves happen to share shapes) is rejected on load instead
    of silently truncating.
    """
    leaves, treedef = _flatten(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__n_leaves"] = np.asarray(len(leaves), np.int64)
    payload["__treedef"] = np.frombuffer(str(treedef).encode("utf-8"), np.uint8)
    np.savez(path, **payload)


def load_state(path, template: Any) -> Any:
    """Load a pytree saved by save_state, shaped like ``template``."""
    data = np.load(path)
    t_leaves, treedef = _flatten(template)
    if "__n_leaves" in data.files:
        n_saved = int(data["__n_leaves"])
        if n_saved != len(t_leaves):
            raise ValueError(
                f"checkpoint has {n_saved} leaves but template has "
                f"{len(t_leaves)} — refusing to load a structurally "
                "different state"
            )
    if "__treedef" in data.files:
        saved_td = bytes(data["__treedef"]).decode("utf-8")
        if saved_td != str(treedef):
            raise ValueError(
                "checkpoint treedef does not match template structure:\n"
                f"  saved:    {saved_td}\n  template: {treedef}"
            )
    leaves = []
    for i, t_leaf in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        t_arr = np.asarray(t_leaf)
        if arr.shape != t_arr.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {t_arr.shape}"
            )
        if (
            np.issubdtype(t_arr.dtype, np.integer)
            and not np.issubdtype(arr.dtype, np.integer)
        ) or (
            np.issubdtype(t_arr.dtype, np.floating)
            and not np.issubdtype(arr.dtype, np.floating)
        ):
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} is not compatible "
                f"with template dtype {t_arr.dtype}"
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
