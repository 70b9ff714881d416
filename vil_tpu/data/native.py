"""ctypes bindings for the native TSV core (native/tsv_core.cpp).

Compiled lazily with g++ on first use and cached under native/build/. All
entry points degrade gracefully to the pure-Python implementations in
``vil_tpu.data.tsv`` when the toolchain or library is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import os.path as op
import subprocess
import threading

logger = logging.getLogger(__name__)

_REPO_ROOT = op.dirname(op.dirname(op.dirname(op.abspath(__file__))))
_SRC = op.join(_REPO_ROOT, "native", "tsv_core.cpp")
_BUILD_DIR = op.join(_REPO_ROOT, "native", "build")
_SO = op.join(_BUILD_DIR, "libtsv_core.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # noqa: BLE001
        logger.info("native tsv_core unavailable (%s); using python fallback", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not op.isfile(_SRC):
            return None
        if not op.isfile(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.build_lineidx.restype = ctypes.c_int64
        lib.build_lineidx.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
        lib.count_rows.restype = ctypes.c_int64
        lib.count_rows.argtypes = [ctypes.c_char_p]
        lib.tsv_open.restype = ctypes.c_int
        lib.tsv_open.argtypes = [ctypes.c_char_p]
        lib.tsv_close.argtypes = [ctypes.c_int]
        lib.read_row.restype = ctypes.c_int64
        lib.read_row.argtypes = [
            ctypes.c_int, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.b64_decode.restype = ctypes.c_int64
        lib.b64_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def build_lineidx(tsv_path: str, idx_path: str) -> bool:
    """Native lineidx build; returns False if the caller must fall back."""
    lib = get_lib()
    if lib is None:
        return False
    tmp = idx_path + ".tmp"
    rows = lib.build_lineidx(tsv_path.encode(), tmp.encode())
    if rows < 0:
        return False
    os.replace(tmp, idx_path)
    return True


class NativeRowReader:
    """pread-based random row access; one fd shared by all loader threads."""

    def __init__(self, path: str, max_row_bytes: int = 1 << 22):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native tsv core unavailable")
        self._lib = lib
        self._fd = lib.tsv_open(path.encode())
        if self._fd < 0:
            raise OSError(f"cannot open {path}")
        self._cap = max_row_bytes

    def read(self, offset: int) -> bytes:
        cap = self._cap
        while True:
            buf = ctypes.create_string_buffer(cap)
            n = self._lib.read_row(self._fd, offset, buf, cap)
            if n == -2:
                cap *= 4
                continue
            if n < 0:
                raise OSError("read_row failed")
            return buf.raw[:n]

    def close(self):
        if self._fd >= 0:
            self._lib.tsv_close(self._fd)
            self._fd = -1

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def b64_decode(data: bytes) -> bytes:
    lib = get_lib()
    if lib is None:
        import base64

        return base64.b64decode(data)
    out = ctypes.create_string_buffer(3 * (len(data) // 4) + 3)
    n = lib.b64_decode(data, len(data), out)
    if n < 0:
        raise ValueError("invalid base64")
    return out.raw[:n]
