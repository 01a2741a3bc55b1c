"""ctypes binding for the native CSV loader (``native/csv_loader.cpp``).

Auto-builds the shared library on first use (g++ is part of the toolchain)
and caches it next to the source; every entry point degrades gracefully to
the pandas path (``rankaae_tpu.data.dataset``) when the toolchain or binary
is unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librankaae_data.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "csv_loader.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, _SRC_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.exists(_SRC_PATH)
            and os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        ):
            if not os.path.exists(_SRC_PATH) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.rankaae_csv_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rankaae_csv_dims.restype = ctypes.c_int
        lib.rankaae_csv_header.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64
        ]
        lib.rankaae_csv_header.restype = ctypes.c_int64
        lib.rankaae_csv_read.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.rankaae_csv_read.restype = ctypes.c_int64
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def load_csv_native(path: str, n_index_cols: int = 2) -> Tuple[List[str], np.ndarray]:
    """Parse a RankAAE-schema CSV: returns (data column names,
    (n_rows, n_data_cols) float32 array).  Raises RuntimeError when the
    native library is unavailable — callers should fall back to pandas."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native CSV loader unavailable (g++ build failed?)")

    bpath = os.fspath(path).encode()
    n_rows = ctypes.c_int64()
    n_cols = ctypes.c_int64()
    rc = lib.rankaae_csv_dims(bpath, ctypes.byref(n_rows), ctypes.byref(n_cols))
    if rc != 0:
        raise RuntimeError(f"rankaae_csv_dims failed with {rc} on {path}")

    buf = ctypes.create_string_buffer(1024 * 1024)
    hlen = lib.rankaae_csv_header(bpath, buf, len(buf))
    if hlen < 0:
        raise RuntimeError(f"rankaae_csv_header failed on {path}")
    header = buf.value.decode().split(",")
    data_cols = header[n_index_cols:]
    n_data_cols = n_cols.value - n_index_cols

    out = np.empty((n_rows.value, n_data_cols), np.float32)
    got = lib.rankaae_csv_read(
        bpath, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_rows.value, n_data_cols, n_index_cols,
    )
    if got != n_rows.value:
        raise RuntimeError(
            f"rankaae_csv_read parsed {got}/{n_rows.value} rows of {path}"
        )
    return data_cols, out
