"""Cost-parameter hot-reload.

Capability parity with the reference CostFunctionUpdater
(/root/reference/Cost_Functions/CostFunctionUpdater.py:8-68): watch the cost
YAML, re-parse it on modification, and raise a flag the control loop consumes
at the next step.  The watchdog package is replaced by a stdlib polling thread
(mtime check); the single-writer bool-flag handoff pattern is kept, and
updated parameters flow into the next jitted call as *arguments*, so a reload
never recompiles.
"""
from __future__ import annotations

import atexit
import threading
from pathlib import Path
from typing import Dict, Optional

import yaml

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

_watchers: Dict[str, "CostFunctionUpdater"] = {}
_watchers_lock = threading.Lock()


class CostFunctionUpdater:
    """Polls one YAML file; on change, updates the bound cost function config."""

    POLL_INTERVAL_S = 0.25

    def __init__(self, cost_function, environment_name: str, cost_function_name: str, config_path: Path):
        # ALL cost functions bound to this watcher get updated on reload
        # (multiple live controllers can watch the same (path, env, name) —
        # rebinding to only the newest would silently orphan the others).
        # WEAK references: every configure() appends a fresh cost instance
        # and nothing unregisters, so strong refs would pin dead
        # controllers' costs forever in a long-lived serving process.
        import weakref

        self._cost_refs = [weakref.ref(cost_function)]
        self.environment_name = environment_name
        self.cost_function_name = cost_function_name
        self.config_path = Path(config_path)
        self._mtime = self._stat_mtime()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name=f"cost-updater-{self.config_path.name}", daemon=True
        )
        self._thread.start()

    @property
    def cost_functions(self):
        """Live bound cost functions; garbage-collected ones are pruned
        from the ref list as a side effect."""
        live, refs = [], []
        for r in self._cost_refs:
            cf = r()
            if cf is not None:
                live.append(cf)
                refs.append(r)
        self._cost_refs = refs
        return live

    @classmethod
    def ensure_watching(cls, cost_function, environment_name, cost_function_name, config_path) -> "CostFunctionUpdater":
        """Deduplicate watchers per (path, env, name) — reference :20-53."""
        key = f"{config_path}::{environment_name}::{cost_function_name}"
        with _watchers_lock:
            if key not in _watchers:
                _watchers[key] = cls(cost_function, environment_name, cost_function_name, Path(config_path))
            elif not any(cf is cost_function
                         for cf in _watchers[key].cost_functions):
                import weakref

                _watchers[key]._cost_refs.append(weakref.ref(cost_function))
            return _watchers[key]

    def _stat_mtime(self) -> Optional[float]:
        try:
            return self.config_path.stat().st_mtime
        except OSError:
            return None

    def _run(self) -> None:
        while not self._stop.wait(self.POLL_INTERVAL_S):
            mtime = self._stat_mtime()
            if mtime is not None and mtime != self._mtime:
                self._mtime = mtime
                self._reload()

    def _reload(self) -> None:
        try:
            with open(self.config_path) as f:
                full = yaml.safe_load(f) or {}
            env_cfg = full.get(self.environment_name, {}) or {}
            new_cfg = env_cfg.get(self.cost_function_name, {}) or {}
        except Exception as e:  # malformed mid-write YAML: retry on next poll
            logger.warning(f"cost config reload failed ({e}); keeping old params")
            return
        for cf in self.cost_functions:  # live refs only; dead ones pruned
            cf.config.update(new_cfg)
            # Single-writer flag read by each control loop at its next step
            # (reference CostFunctionUpdater.py:68 / cost_function_wrapper.py:71-74).
            cf.reload_cost_parameters_from_config_flag = True
        logger.info(f"hot-reloaded cost parameters from {self.config_path}")

    def stop(self) -> None:
        self._stop.set()


@atexit.register
def _cleanup() -> None:
    with _watchers_lock:
        for w in _watchers.values():
            w.stop()
        _watchers.clear()
