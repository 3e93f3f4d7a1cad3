"""Native (C) runtime components, built on demand and bound via ctypes.

The TPU framework's compute path is JAX/XLA/Pallas; this package holds the
host-side native pieces around it.  Currently: :mod:`fastio` — the
fixed-width ASCII table writer used by every ``.prf`` exporter (the
reference's per-cell Python ``"%0.12f"`` loops, PODFS.py:879-884 /
1739-1745 / 1794-1800, are the export bottleneck at production plane sizes).

The shared library is compiled once per machine with the system C compiler
into ``<package>/_build/`` (falling back to a temp dir if the package is not
writable) and loaded with ctypes — no Python.h / pybind11 dependency.  All
callers degrade gracefully to the pure-Python formatter if no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fastio.c")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dirs():
    yield os.path.join(os.path.dirname(__file__), "_build")
    yield os.path.join(tempfile.gettempdir(),
                       f"pods_digital_filter_tpu_native_{os.getuid()}")


def _compile() -> str | None:
    for cc in ("cc", "gcc", "clang"):
        for bdir in _build_dirs():
            try:
                os.makedirs(bdir, exist_ok=True)
                out = os.path.join(bdir, "libfastio.so")
                src_m = os.path.getmtime(_SRC)
                if os.path.exists(out) and os.path.getmtime(out) >= src_m:
                    return out
                tmp = out + f".tmp{os.getpid()}"
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", tmp, _SRC, "-lm"],
                    check=True, capture_output=True, timeout=120)
                os.replace(tmp, out)
                return out
            except (OSError, subprocess.SubprocessError):
                continue
    return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        path = _compile()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
            for name in ("write_rows_fixed12", "write_rows_g17"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_long
                fn.argtypes = [
                    ctypes.c_char_p, ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_long, ctypes.c_long, ctypes.c_char,
                ]
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _call(fn_name: str, path: str, mode: str, rows: np.ndarray,
          sep: str) -> bool:
    lib = _load()
    if lib is None:
        return False
    rows = np.ascontiguousarray(rows, dtype=np.float64)
    if rows.ndim != 2:
        raise ValueError(f"rows must be 2-D; got shape {rows.shape}")
    n = getattr(lib, fn_name)(
        path.encode(), mode.encode(),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rows.shape[0], rows.shape[1], sep.encode(),
    )
    if n != rows.shape[0]:
        raise OSError(f"native writer failed for {path!r} (wrote {n} rows)")
    return True


def write_rows_fixed12(path: str, mode: str, rows: np.ndarray,
                       sep: str = ",") -> bool:
    """Append/write ``rows`` as sep-joined ``%0.12f`` lines.  Returns False
    (without writing) when the native library is unavailable."""
    return _call("write_rows_fixed12", path, mode, rows, sep)


def write_rows_g17(path: str, mode: str, rows: np.ndarray,
                   sep: str = "\t") -> bool:
    """Append/write ``rows`` as sep-joined ``%.17g`` lines."""
    return _call("write_rows_g17", path, mode, rows, sep)
