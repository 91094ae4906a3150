"""YAML config system.

Keeps the reference's three-file contract (config_controllers.yml,
config_optimizers.yml, config_cost_function.yml living in an application's
``Control_Toolkit_ASF`` folder — /root/reference/Controllers/__init__.py:13,
/root/reference/Controllers/controller_mpc.py:16-17) while adding:

* an explicit, overridable search path instead of CWD-relative implicit loads,
* packaged default configs so the toolkit runs standalone,
* mtime-based reload support used by the cost-parameter hot-reloader.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

# Default configs shipped with the package (parallels the reference's
# Control_Toolkit_ASF_Template/*.yml).
_PACKAGED_CONFIG_DIR = Path(__file__).resolve().parent.parent / "config_defaults"

CONFIG_CONTROLLERS = "config_controllers.yml"
CONFIG_OPTIMIZERS = "config_optimizers.yml"
CONFIG_COST_FUNCTION = "config_cost_function.yml"

_asf_dir_override: Optional[Path] = None


def set_asf_config_dir(path: os.PathLike | str | None) -> None:
    """Point the toolkit at an application's Control_Toolkit_ASF directory."""
    global _asf_dir_override
    _asf_dir_override = Path(path) if path is not None else None


def get_asf_config_dir() -> Optional[Path]:
    if _asf_dir_override is not None:
        return _asf_dir_override
    env = os.environ.get("CONTROL_TOOLKIT_ASF_DIR")
    if env:
        return Path(env)
    cwd_asf = Path.cwd() / "Control_Toolkit_ASF"
    if cwd_asf.is_dir():
        return cwd_asf
    return None


def resolve_config_path(filename: str) -> Path:
    """Find a config file: ASF dir first, packaged defaults as fallback."""
    asf = get_asf_config_dir()
    if asf is not None:
        candidate = asf / filename
        if candidate.is_file():
            return candidate
    packaged = _PACKAGED_CONFIG_DIR / filename
    if packaged.is_file():
        return packaged
    raise FileNotFoundError(
        f"Config file {filename!r} not found in ASF dir ({asf}) or packaged defaults"
    )


def load_yaml(path: os.PathLike | str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def load_config(filename: str) -> Dict[str, Any]:
    return load_yaml(resolve_config_path(filename))


def load_controller_config(controller_name: str) -> Dict[str, Any]:
    cfg = load_config(CONFIG_CONTROLLERS)
    if controller_name not in cfg:
        raise KeyError(
            f"Controller {controller_name!r} has no entry in {CONFIG_CONTROLLERS}"
        )
    return dict(cfg[controller_name])


def load_optimizer_config(optimizer_name: str) -> Dict[str, Any]:
    cfg = load_config(CONFIG_OPTIMIZERS)
    if optimizer_name not in cfg:
        raise KeyError(
            f"Optimizer {optimizer_name!r} has no entry in {CONFIG_OPTIMIZERS}"
        )
    return dict(cfg[optimizer_name])


def load_cost_config() -> Dict[str, Any]:
    return load_config(CONFIG_COST_FUNCTION)
