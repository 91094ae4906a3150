"""Name-based component registries.

Capability parity with the reference's glob-based plugin discovery
(/root/reference/others/globals_and_utils.py:103-263): controllers, optimizers,
cost functions, predictors and environments are resolvable by short string
names, application-specific (ASF) registrations shadow built-ins, and the
"optimizer name used as controller name" sugar resolves to the MPC controller.

Redesign: instead of file globbing + import_module, components register
themselves with a decorator at import time.  ASF plugin packages are imported
lazily by dotted path, after which their registrations are visible here.
"""
from __future__ import annotations

import importlib
from typing import Callable, Dict, Iterable, Optional, Type

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)


class Registry:
    """A two-tier (builtin / ASF-override) name->class registry."""

    def __init__(self, kind: str):
        self.kind = kind
        self._builtin: Dict[str, type] = {}
        self._asf: Dict[str, type] = {}

    def register(self, name: str, *, asf: bool = False) -> Callable[[type], type]:
        def deco(cls: type) -> type:
            tier = self._asf if asf else self._builtin
            if name in tier:
                raise ValueError(
                    f"Duplicate {self.kind} registration for name {name!r}"
                )
            tier[name] = cls
            cls.registered_name = name
            return cls
        return deco

    def get(self, name: str) -> type:
        # ASF registrations shadow built-ins (reference precedence:
        # globals_and_utils.py:150-160).
        if name in self._asf:
            return self._asf[name]
        if name in self._builtin:
            return self._builtin[name]
        raise KeyError(
            f"No {self.kind} named {name!r}. Available: {sorted(self.names())}"
        )

    def __contains__(self, name: str) -> bool:
        return name in self._asf or name in self._builtin

    def names(self) -> Iterable[str]:
        return sorted(set(self._builtin) | set(self._asf))


controllers = Registry("controller")
optimizers = Registry("optimizer")
cost_functions = Registry("cost_function")
predictors = Registry("predictor")
environments = Registry("environment")

_BUILTINS_LOADED = False


def _load_builtins() -> None:
    """Import built-in component modules so their registrations run."""
    global _BUILTINS_LOADED
    if _BUILTINS_LOADED:
        return
    _BUILTINS_LOADED = True
    for mod in (
        "control_toolkit_tpu.optimizers.random_action",
        "control_toolkit_tpu.optimizers.cem",
        "control_toolkit_tpu.optimizers.cem_naive_grad",
        "control_toolkit_tpu.optimizers.cem_gmm",
        "control_toolkit_tpu.optimizers.cem_grad_bharadhwaj",
        "control_toolkit_tpu.optimizers.icem",
        "control_toolkit_tpu.optimizers.cma_es",
        "control_toolkit_tpu.optimizers.gradient",
        "control_toolkit_tpu.optimizers.mppi",
        "control_toolkit_tpu.optimizers.mppi_var",
        "control_toolkit_tpu.optimizers.rpgd",
        "control_toolkit_tpu.optimizers.ilqr",
        "control_toolkit_tpu.controllers.mpc",
        "control_toolkit_tpu.controllers.batched_mpc",
        "control_toolkit_tpu.controllers.neural_imitator",
        "control_toolkit_tpu.controllers.remote",
        "control_toolkit_tpu.controllers.embedded",
        "control_toolkit_tpu.controllers.c_controller",
        "control_toolkit_tpu.costs.cartpole",
        "control_toolkit_tpu.costs.pendulum",
        "control_toolkit_tpu.costs.acrobot",
        "control_toolkit_tpu.costs.pointmass",
        "control_toolkit_tpu.costs.quadrotor2d",
        "control_toolkit_tpu.costs.quadrotor3d",
        "control_toolkit_tpu.costs.car",
        "control_toolkit_tpu.costs.arm2",
        "control_toolkit_tpu.models.predictors",
        "control_toolkit_tpu.environments.cartpole",
        "control_toolkit_tpu.environments.pendulum",
        "control_toolkit_tpu.environments.acrobot",
        "control_toolkit_tpu.environments.pointmass",
        "control_toolkit_tpu.environments.quadrotor2d",
        "control_toolkit_tpu.environments.quadrotor3d",
        "control_toolkit_tpu.environments.car",
        "control_toolkit_tpu.environments.arm2",
    ):
        try:
            importlib.import_module(mod)
        except ImportError as e:  # pragma: no cover - partial builds
            logger.debug(f"Builtin module {mod} not importable: {e}")


def load_asf_package(dotted_path: str) -> None:
    """Import an application-specific (ASF) plugin package.

    The package is expected to register its components via the decorators in
    this module with ``asf=True``; this mirrors the reference contract where
    the app's Control_Toolkit_ASF folder shadows toolkit components.
    """
    importlib.import_module(dotted_path)


def import_controller_by_name(name: str):
    """Resolve a controller class by registry name.

    Mirrors the reference sugar (globals_and_utils.py:201-233): if ``name``
    is actually an optimizer name, the MPC controller class is returned and
    the caller should pass the optimizer name to ``configure``.
    """
    _load_builtins()
    if name in controllers:
        return controllers.get(name)
    if name in optimizers:
        logger.info(
            f"{name!r} is an optimizer; resolving to the 'mpc' controller."
        )
        return controllers.get("mpc")
    raise KeyError(f"No controller or optimizer named {name!r}")


def import_optimizer_by_name(name: str):
    _load_builtins()
    return optimizers.get(name)


def find_optimizer_if_it_exists(name: str) -> Optional[type]:
    _load_builtins()
    try:
        return optimizers.get(name)
    except KeyError:
        return None


def get_available_controller_names() -> list:
    _load_builtins()
    return list(controllers.names())


def get_available_optimizer_names() -> list:
    _load_builtins()
    return list(optimizers.names())


def _resolve_name_or_idx(kind, names, name, idx):
    """Shared body of the reference's name<->index resolvers
    (globals_and_utils.py:201-264): exactly one of ``name``/``idx`` must
    be given; returns ``(name, idx)`` within ``names``, or ``None`` when
    the name is unknown (reference semantics: print-and-return-None, so
    interactive pickers can re-prompt)."""
    if (name is None) == (idx is None):
        raise ValueError(
            f"Specify either {kind}_name or {kind}_idx to select a "
            f"{kind} — got {'both' if name is not None else 'neither'}."
        )
    if name is not None:
        try:
            idx = names.index(name)
        except ValueError:
            logger.warning(f"{name!r} is not in list. In list are: {names}")
            return None
    else:
        name = names[idx]
    return name, idx


def get_controller_name(controller_names=None, controller_name=None,
                        controller_idx=None):
    """Resolve a controller by name OR list index; returns (name, idx).

    Reference parity: globals_and_utils.py:201-231 (used by apps that
    cycle controllers with a hotkey index)."""
    if controller_names is None:
        controller_names = get_available_controller_names()
    return _resolve_name_or_idx(
        "controller", controller_names, controller_name, controller_idx
    )


def get_optimizer_name(optimizer_names=None, optimizer_name=None,
                       optimizer_idx=None):
    """Resolve an optimizer by name OR list index; returns (name, idx).

    Reference parity: globals_and_utils.py:234-264."""
    if optimizer_names is None:
        optimizer_names = get_available_optimizer_names()
    return _resolve_name_or_idx(
        "optimizer", optimizer_names, optimizer_name, optimizer_idx
    )
