"""Native library build + load helpers.

The reference compiles native code at runtime with gcc and loads it via
ctypes (controller_C.py:222-274); we follow the same robust pattern for our
C++ runtime pieces: compile once into a per-user cache directory keyed by a
source hash, then ctypes-load.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

from control_toolkit_tpu.utils.logging_util import get_logger

logger = get_logger(__name__)

NATIVE_DIR = Path(__file__).resolve().parent


def _cache_dir() -> Path:
    d = Path(os.environ.get("CTT_NATIVE_CACHE", Path.home() / ".cache" / "control_toolkit_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def build_cpp_shared(sources, name: str, extra_flags=()) -> Path:
    """Compile C++ sources into a cached shared library; return its path."""
    sources = [Path(s) for s in sources]
    h = hashlib.sha256()
    for s in sources:
        h.update(s.read_bytes())
    h.update(" ".join(extra_flags).encode())
    out = _cache_dir() / f"{name}-{h.hexdigest()[:16]}.so"
    if out.exists():
        return out
    # Build to a pid-suffixed temp path and rename into place: a direct
    # write means a concurrent builder (parallel/launch.py workers) or an
    # interrupted link leaves a truncated .so that out.exists() would
    # then serve forever.  rename() within one directory is atomic.
    tmp = out.with_suffix(f".tmp{os.getpid()}")
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-o", str(tmp)]
    cmd += [str(s) for s in sources]
    cmd += list(extra_flags)
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        tmp.unlink(missing_ok=True)
        raise RuntimeError(f"g++ build of {name} failed:\n{result.stderr}")
    os.replace(tmp, out)
    logger.info(f"built native library {out.name}")
    return out


_uart_lib = None


def load_uart_lib() -> ctypes.CDLL:
    global _uart_lib
    if _uart_lib is not None:
        return _uart_lib
    so = build_cpp_shared([NATIVE_DIR / "uart" / "uart_core.cpp"], "ctt_uart")
    lib = ctypes.CDLL(str(so))

    c = ctypes
    lib.ctt_uart_crc8.argtypes = [c.POINTER(c.c_ubyte), c.c_int]
    lib.ctt_uart_crc8.restype = c.c_ubyte
    lib.ctt_uart_open.argtypes = [c.c_char_p, c.c_int]
    lib.ctt_uart_open.restype = c.c_void_p
    lib.ctt_uart_from_fd.argtypes = [c.c_int]
    lib.ctt_uart_from_fd.restype = c.c_void_p
    lib.ctt_uart_close.argtypes = [c.c_void_p]
    lib.ctt_uart_ping.argtypes = [c.c_void_p, c.c_int]
    lib.ctt_uart_ping.restype = c.c_int
    lib.ctt_uart_get_spec.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.c_char_p, c.c_int,
        c.POINTER(c.c_int), c.POINTER(c.c_int), c.c_int, c.c_int,
    ]
    lib.ctt_uart_get_spec.restype = c.c_int
    lib.ctt_uart_send_state.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int]
    lib.ctt_uart_send_state.restype = c.c_int
    lib.ctt_uart_receive_outputs.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int]
    lib.ctt_uart_receive_outputs.restype = c.c_int
    lib.ctt_uart_has_pending_spec.argtypes = [c.c_void_p]
    lib.ctt_uart_has_pending_spec.restype = c.c_int
    lib.ctt_uart_take_pending_spec.argtypes = [
        c.c_void_p, c.POINTER(c.c_int), c.c_char_p, c.c_int,
        c.POINTER(c.c_int), c.POINTER(c.c_int),
    ]
    lib.ctt_uart_take_pending_spec.restype = c.c_int
    lib.ctt_uart_drain.argtypes = [c.c_void_p]
    _uart_lib = lib
    return lib
