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
    import json

    leaves, treedef = _flatten(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__n_leaves"] = np.asarray(len(leaves), np.int64)
    # Stable structural key: OUR formatting of the leaf paths (keystr),
    # not str(PyTreeDef) whose repr may change across JAX versions.
    paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    ]
    payload["__paths"] = np.frombuffer(json.dumps(paths).encode("utf-8"), np.uint8)
    np.savez(path, **payload)


def load_state(path, template: Any) -> Any:
    """Load a pytree saved by save_state, shaped like ``template``."""
    import os

    # np.savez appends '.npz' to extension-less paths but np.load does
    # not: make save/load round-trip on the same path string.
    if not os.path.exists(path) and not str(path).endswith(".npz"):
        path = f"{path}.npz"
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
    if "__paths" in data.files:
        import json

        saved_paths = json.loads(bytes(data["__paths"]).decode("utf-8"))
        tmpl_paths = [
            jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]
        ]
        if saved_paths != tmpl_paths:
            raise ValueError(
                "checkpoint treedef does not match template structure:\n"
                f"  saved:    {saved_paths}\n  template: {tmpl_paths}"
            )
    elif "__treedef" in data.files:
        # Legacy checkpoints stored str(PyTreeDef), which has no
        # cross-version stability guarantee: warn on mismatch and rely on
        # the leaf count/shape/dtype checks below.
        saved_td = bytes(data["__treedef"]).decode("utf-8")
        if saved_td != str(treedef):
            import warnings

            warnings.warn(
                "legacy checkpoint treedef string differs from the "
                "template's (possibly a JAX version change); relying on "
                "leaf count/shape/dtype checks only."
            )
    leaves = []
    for i, t_leaf in enumerate(t_leaves):
        arr = data[f"leaf_{i}"]
        t_arr = np.asarray(t_leaf)
        if arr.shape != t_arr.shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {arr.shape} != template {t_arr.shape}"
            )
        # Kind-compatible casts only: i<->u is fine, everything else
        # (f->i, f->b, i->b, ...) is rejected instead of silently cast.
        k_saved, k_tmpl = arr.dtype.kind, t_arr.dtype.kind
        compatible = k_saved == k_tmpl or {k_saved, k_tmpl} <= {"i", "u"}
        if not compatible:
            raise ValueError(
                f"checkpoint leaf {i} dtype {arr.dtype} is not compatible "
                f"with template dtype {t_arr.dtype}"
            )
        leaves.append(jax.numpy.asarray(arr.astype(t_arr.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_optimizer(path, optimizer) -> None:
    """Checkpoint an optimizer's full warm-start state (population,
    distribution moments, Adam m/v, PRNG key, counters, u_prev)."""
    if optimizer.opt_state is None:
        # tree_flatten(None) is zero leaves: the write would "succeed" and
        # the mistake only surface at load time, far from the bug site.
        raise RuntimeError("optimizer not configured; call configure() first")
    save_state(path, optimizer.opt_state)


def load_optimizer(path, optimizer) -> None:
    if optimizer.opt_state is None:
        raise RuntimeError("optimizer not configured; call configure() first")
    # place_state applies the sharding plan OR commits to the device pin —
    # restoring uncommitted leaves into a pinned controller would flip the
    # jit cache key on the second post-resume step (full recompile).
    optimizer.opt_state = optimizer.place_state(
        load_state(path, optimizer.opt_state)
    )


def save_fleet(path, controller) -> None:
    """Checkpoint a BatchedMPCController's FULL fleet: every slot's
    warm-start optimizer state, per-slot RNN hidden (stateful predictors),
    per-slot environment attributes, and per-slot dynamics constants
    (heterogeneous fleets).  A serving process can be stopped and a new one
    resumed with every session's warm start intact — the production-serving
    counterpart of ``save_controller`` (the reference has no checkpointing
    at all, SURVEY §5).

    Multi-process meshes are out of scope: the slot leaves must be fully
    addressable from this process (single-process meshes are fine).
    """
    save_state(path, _fleet_payload(controller))


def _fleet_payload(controller):
    if getattr(controller, "slot_states", None) is None:
        raise RuntimeError("controller not configured; call configure() first")
    return {
        "slot_states": controller.slot_states,
        "slot_hidden": tuple(getattr(controller, "slot_hidden", ()) or ()),
        "slot_attrs": dict(controller.slot_attrs),
        "slot_dyn": dict(controller.slot_dyn),
    }


def load_fleet(path, controller) -> None:
    """Restore a ``save_fleet`` checkpoint into an identically-configured
    BatchedMPCController (same optimizer/predictor/num_slots/per_slot_dyn).
    Slot leaves go through the controller's placement plan (device pin or
    slot-axis sharding) so resuming never flips the jit cache key."""
    payload = load_state(path, _fleet_payload(controller))
    controller.slot_states = controller._place_slots(payload["slot_states"])
    if payload["slot_hidden"]:
        controller.slot_hidden = controller._place_slots(
            tuple(payload["slot_hidden"])
        )
    # Host-side [B] rows, mutated IN PLACE by update_slot_* — must be
    # writable numpy copies (np.asarray over a jax buffer is read-only).
    controller.slot_attrs = {
        k: np.array(v) for k, v in payload["slot_attrs"].items()
    }
    controller.slot_dyn = {
        k: np.array(v) for k, v in payload["slot_dyn"].items()
    }


def save_controller(path, controller) -> None:
    """Checkpoint an MPC controller: optimizer state + variable parameters."""
    payload = {
        "opt_state": controller.optimizer.opt_state,
        "attrs": dict(controller.variable_parameters),
    }
    save_state(path, payload)


def load_controller(path, controller) -> None:
    if getattr(controller.optimizer, "opt_state", None) is None:
        raise RuntimeError("controller not configured; call configure() first")
    template = {
        "opt_state": controller.optimizer.opt_state,
        "attrs": dict(controller.variable_parameters),
    }
    payload = load_state(path, template)
    controller.optimizer.opt_state = controller.optimizer.place_state(
        payload["opt_state"]
    )
    # route through update_attributes: it owns device-pin placement
    controller.update_attributes(payload["attrs"])
