"""Native (C++) host-runtime kernels with lazy compilation + ctypes binding.

The device compute path is JAX/XLA/Pallas; the host-sequential runtime
pieces the reference implements in C++ (union-find track building,
`track_builder.cc`; greedy MFAS ordering,
`filter_view_pairs_from_relative_translation.cc:165`) are C ABI functions in
`graphcore.cpp`, compiled on first use with the system g++ and loaded via
ctypes. All callers keep pure-numpy fallbacks: `uf_components` /
`mfas_ordering` return None when the native library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "build", "uf_components", "mfas_ordering"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graphcore.cpp")
_SO = os.path.join(_DIR, "_graphcore.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile graphcore.cpp -> _graphcore.so. Returns success."""
    if (
        not force
        and os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return True
    try:
        subprocess.run(
            [
                "g++",
                "-O2",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _SO + ".tmp",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.uf_components.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, i64p,
        ]
        lib.uf_components.restype = None
        lib.mfas_ordering.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p, f64p, i64p,
        ]
        lib.mfas_ordering.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _i64(a):
    return np.ascontiguousarray(a, np.int64)


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def uf_components(num_nodes: int, edges_a, edges_b):
    """Component root per node, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    ea = _i64(edges_a)
    eb = _i64(edges_b)
    out = np.empty(num_nodes, np.int64)
    lib.uf_components(
        ctypes.c_int64(num_nodes),
        ctypes.c_int64(len(ea)),
        _ptr(ea, ctypes.c_int64),
        _ptr(eb, ctypes.c_int64),
        _ptr(out, ctypes.c_int64),
    )
    return out


def mfas_ordering(num_nodes: int, src, dst, weights):
    """Greedy MFAS ordering, or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    s = _i64(src)
    d = _i64(dst)
    w = np.ascontiguousarray(weights, np.float64)
    out = np.empty(num_nodes, np.int64)
    lib.mfas_ordering(
        ctypes.c_int64(num_nodes),
        ctypes.c_int64(len(s)),
        _ptr(s, ctypes.c_int64),
        _ptr(d, ctypes.c_int64),
        _ptr(w, ctypes.c_double),
        _ptr(out, ctypes.c_int64),
    )
    return out
