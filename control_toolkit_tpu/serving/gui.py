"""Controller/optimizer picker.

Capability parity with the reference Qt radio-button dialog
(/root/reference/controller_server/gui.py:19-89), with graceful degradation:
PyQt6 dialog when a display + PyQt6 are available, otherwise an interactive
terminal prompt, otherwise defaults — so headless serving never blocks on a
GUI.
"""
from __future__ import annotations

import os
import sys
from typing import Optional, Tuple

from control_toolkit_tpu.utils.logging_util import get_logger
from control_toolkit_tpu.utils.registry import (
    get_available_controller_names,
    get_available_optimizer_names,
)

logger = get_logger(__name__)


def _choose_qt(controllers, optimizers, default_controller, default_optimizer):
    from PyQt6.QtWidgets import (
        QApplication, QButtonGroup, QDialog, QDialogButtonBox, QGroupBox,
        QHBoxLayout, QRadioButton, QVBoxLayout,
    )

    app = QApplication.instance() or QApplication(sys.argv)
    dlg = QDialog()
    dlg.setWindowTitle("Select controller and optimizer")
    layout = QHBoxLayout(dlg)

    groups = []
    for title, names, default in (
        ("Controller", controllers, default_controller),
        ("Optimizer", optimizers, default_optimizer),
    ):
        box = QGroupBox(title)
        vbox = QVBoxLayout(box)
        bg = QButtonGroup(dlg)
        for name in names:
            rb = QRadioButton(name)
            if name == (default or names[0]):
                rb.setChecked(True)
            bg.addButton(rb)
            vbox.addWidget(rb)
        groups.append(bg)
        layout.addWidget(box)

    buttons = QDialogButtonBox(
        QDialogButtonBox.StandardButton.Ok | QDialogButtonBox.StandardButton.Cancel
    )
    buttons.accepted.connect(dlg.accept)
    buttons.rejected.connect(dlg.reject)
    layout.addWidget(buttons)

    if dlg.exec() != QDialog.DialogCode.Accepted:
        raise SystemExit("selection cancelled")
    picks = []
    for bg in groups:
        btn = bg.checkedButton()
        # Nothing checked happens when the provided default matched no name.
        picks.append(btn.text() if btn is not None else bg.buttons()[0].text())
    return picks[0], picks[1]


def _choose_terminal(controllers, optimizers, default_controller, default_optimizer):
    def ask(title, names, default):
        print(f"{title}:")
        for i, n in enumerate(names):
            marker = "*" if n == default else " "
            print(f"  [{i}]{marker} {n}")
        try:
            raw = input(f"choice [default {default or names[0]}]: ").strip()
        except EOFError:
            # Ctrl-D / closed tty must degrade to defaults, not kill
            # server startup (the module contract).
            print("EOF; using default")
            return default or names[0]
        if not raw:
            return default or names[0]
        if raw.isdigit():
            idx = int(raw)
            if 0 <= idx < len(names):
                return names[idx]
            print(f"index {idx} out of range; using default")
            return default or names[0]
        if raw not in names:
            # Same graceful handling as an out-of-range index: a typo'd
            # name would otherwise crash deep in build_controller.
            print(f"{raw!r} is not a known name; using default")
            return default or names[0]
        return raw

    c = ask("Controller", controllers, default_controller)
    o = ask("Optimizer", optimizers, default_optimizer)
    return c, o


def choose_controller_and_optimizer(
    default_controller: Optional[str] = None,
    default_optimizer: Optional[str] = None,
) -> Tuple[str, str]:
    controllers = list(get_available_controller_names())
    optimizers = list(get_available_optimizer_names())
    default_controller = default_controller or "mpc"
    default_optimizer = default_optimizer or "mppi"

    if os.environ.get("DISPLAY") or sys.platform == "darwin":
        try:
            return _choose_qt(controllers, optimizers, default_controller, default_optimizer)
        except Exception as e:
            # Not just ImportError: a stale $DISPLAY with PyQt6 installed
            # raises Qt platform/display errors — degrade to the terminal
            # and defaults fallbacks instead of killing server startup.
            logger.warning(f"Qt picker unavailable ({e!r}); falling back")
    if sys.stdin.isatty():
        return _choose_terminal(controllers, optimizers, default_controller, default_optimizer)
    return default_controller, default_optimizer
