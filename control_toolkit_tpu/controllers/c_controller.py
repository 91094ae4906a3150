"""C controller — runtime-compiled native controllers via the Ops ABI.

Capability parity with the reference controller_C
(/root/reference/Controllers/controller_C.py:22-357): copies the firmware C
sources into a temp build dir, emits a generated ``wrapper.c`` exposing
``controller_init/evaluate/get_spec/get_input_names/release`` around the
controller's ``<NAME>_Ops`` struct (ABI in native/cwrapper/controller_api.h),
compiles with ``gcc -shared -fPIC ... -lm``, loads via ctypes with declared
signatures, and steps by marshalling float32 arrays with the standard
name->value input assembly (updated_attributes > state >
variable_parameters > 0).  PC stubs for hardware-only headers are generated
on demand.
"""
from __future__ import annotations

import ctypes
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from control_toolkit_tpu.controllers.base import Controller
from control_toolkit_tpu.models.dynamics import state_indices
from control_toolkit_tpu.utils import registry
from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

BUNDLED_FIRMWARE = Path(__file__).resolve().parent.parent / "native" / "cwrapper"

HW_BRIDGE_STUB = """\
#ifndef HARDWARE_BRIDGE_H
#define HARDWARE_BRIDGE_H
#include <stdint.h>
/* PC build: hardware hooks are no-ops. */
static inline void enable_irq(void) {}
static inline void disable_irq(void) {}
static inline void Message_SendToPC(const unsigned char *d, unsigned int n) {(void)d;(void)n;}
static inline int Message_GetFromPC(unsigned char *d) {(void)d; return 0;}
#endif
"""

WRAPPER_TEMPLATE = """\
/* Auto-generated PC wrapper around the {ops_name} controller. */
#include <string.h>
#include "controller_api.h"

extern const ControllerOps {ops_name};

void controller_init(void) {{
    if ({ops_name}.init) {ops_name}.init();
}}

void controller_evaluate(const float *inputs, float *outputs) {{
    if ({ops_name}.evaluate) {ops_name}.evaluate(inputs, outputs);
}}

void controller_get_spec(int *version, int *n_inputs, int *n_outputs) {{
    const ControllerSpec *s = {ops_name}.spec ? {ops_name}.spec() : 0;
    if (!s) {{ *version = 0; *n_inputs = 0; *n_outputs = 0; return; }}
    *version = s->version;
    *n_inputs = s->n_inputs;
    *n_outputs = s->n_outputs;
}}

void controller_get_input_names(char *buf, int cap) {{
    buf[0] = 0;
    const ControllerSpec *s = {ops_name}.spec ? {ops_name}.spec() : 0;
    if (!s) return;
    int pos = 0;
    for (int i = 0; i < s->n_inputs; ++i) {{
        int len = (int)strlen(s->names[i]);
        if (pos + len + 2 > cap) break;
        memcpy(buf + pos, s->names[i], (size_t)len);
        pos += len;
        if (i + 1 < s->n_inputs) buf[pos++] = ',';
    }}
    buf[pos] = 0;
}}

void controller_release(void) {{
    if ({ops_name}.release) {ops_name}.release();
}}
"""


@registry.controllers.register("c")
class CController(Controller):
    def configure(self, **kwargs) -> None:
        cfg = self.config_controller
        controller_file = cfg.get("controller_file", "lqr.c")
        firmware_path = Path(
            cfg.get("firmware_path") or cfg.get("source_dir") or (BUNDLED_FIRMWARE / "firmware")
        )
        ops_name = cfg.get("ops_name") or f"{Path(controller_file).stem.upper()}_Ops"

        self.temp_dir = Path(tempfile.mkdtemp(prefix="ctt_c_controller_"))
        self._stage_sources(controller_file, firmware_path)
        self._generate_wrapper(ops_name)
        self._compile()
        self._load()
        self._read_spec()
        self.lib_ctypes.controller_init()
        self._state_idx = state_indices(self.environment_name)
        logger.info(
            f"configured C controller {controller_file} ({ops_name}): "
            f"{self.n_inputs} inputs -> {self.n_outputs} outputs"
        )

    # ---- build ------------------------------------------------------------
    def _stage_sources(self, controller_file: str, firmware_path: Path) -> None:
        api = BUNDLED_FIRMWARE / "controller_api.h"
        shutil.copy(api, self.temp_dir / "controller_api.h")

        src = firmware_path / controller_file
        if not src.is_file():
            raise FileNotFoundError(f"controller source not found: {src}")
        shutil.copy(src, self.temp_dir / controller_file)
        self._controller_file = controller_file

        header = src.with_suffix(".h")
        if header.is_file():
            shutil.copy(header, self.temp_dir / header.name)

        # PC stubs for firmware-only headers referenced by some controllers.
        (self.temp_dir / "hardware_bridge.h").write_text(HW_BRIDGE_STUB)

    def _generate_wrapper(self, ops_name: str) -> None:
        (self.temp_dir / "wrapper.c").write_text(
            WRAPPER_TEMPLATE.format(ops_name=ops_name)
        )

    def _compile(self) -> None:
        out = self.temp_dir / "controller.so"
        cmd = [
            "gcc", "-shared", "-fPIC", "-O2", "-o", str(out),
            str(self.temp_dir / "wrapper.c"),
            str(self.temp_dir / self._controller_file),
            "-I", str(self.temp_dir),
            "-lm",
        ]
        result = subprocess.run(cmd, capture_output=True, text=True)
        if result.returncode != 0:
            raise RuntimeError(f"gcc compilation failed:\n{result.stderr}")

    def _load(self) -> None:
        lib = ctypes.CDLL(str(self.temp_dir / "controller.so"))
        c = ctypes
        lib.controller_init.argtypes = []
        lib.controller_evaluate.argtypes = [c.POINTER(c.c_float), c.POINTER(c.c_float)]
        lib.controller_get_spec.argtypes = [
            c.POINTER(c.c_int), c.POINTER(c.c_int), c.POINTER(c.c_int)
        ]
        lib.controller_get_input_names.argtypes = [c.c_char_p, c.c_int]
        lib.controller_release.argtypes = []
        self.lib_ctypes = lib

    def _read_spec(self) -> None:
        version = ctypes.c_int()
        n_in = ctypes.c_int()
        n_out = ctypes.c_int()
        self.lib_ctypes.controller_get_spec(
            ctypes.byref(version), ctypes.byref(n_in), ctypes.byref(n_out)
        )
        self.spec_version = version.value
        self.n_inputs = n_in.value
        self.n_outputs = n_out.value
        buf = ctypes.create_string_buffer(1024)
        self.lib_ctypes.controller_get_input_names(buf, 1024)
        names = buf.value.decode("utf-8")
        self.input_names = names.split(",") if names else []
        if any(n == "" for n in self.input_names):
            # The C template writes each name's comma BEFORE checking the
            # next name fits, so a truncation that drops exactly the last
            # name leaves a trailing comma — split() then yields an empty
            # name whose input slot would silently read 0.0.  Treat it as
            # the truncation it is.
            raise RuntimeError(
                "C controller spec mismatch: empty input name in "
                f"{self.input_names!r} (name buffer truncated?)"
            )
        if len(self.input_names) != self.n_inputs:
            # Name-buffer truncation or a lying spec: never hand the C side
            # uninitialized input slots.
            raise RuntimeError(
                f"C controller spec mismatch: {self.n_inputs} inputs "
                f"declared but {len(self.input_names)} names received "
                "(name buffer truncated?)"
            )

    # ---- hot path ---------------------------------------------------------
    def step(self, s: np.ndarray, time=None, updated_attributes: Optional[Dict] = None):
        updated_attributes = updated_attributes or {}
        self.update_attributes(updated_attributes)

        from control_toolkit_tpu.controllers.base import resolve_named_inputs

        arr = resolve_named_inputs(
            self.input_names, self._state_idx, s, updated_attributes,
            self.variable_parameters, time=time,
        )

        inputs = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        out = np.empty(self.n_outputs, dtype=np.float32)
        outputs = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        self.lib_ctypes.controller_evaluate(inputs, outputs)
        return out[np.newaxis, np.newaxis, :]

    def controller_reset(self) -> None:
        self.lib_ctypes.controller_init()

    def __del__(self):
        # At interpreter shutdown module globals (shutil) may already be
        # cleared to None — swallow everything, __del__ must never raise.
        try:
            lib = getattr(self, "lib_ctypes", None)
            if lib is not None:
                lib.controller_release()
        except Exception:
            pass
        try:
            temp = getattr(self, "temp_dir", None)
            if temp is not None:
                shutil.rmtree(temp, ignore_errors=True)
        except Exception:
            pass
