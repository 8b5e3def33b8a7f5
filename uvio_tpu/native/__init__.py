"""Native host-runtime layer (C++ over a plain C ABI via ctypes).

Compiled lazily on first import with the system toolchain into
`_build/`; all callers fall back to the numpy implementations when the
toolchain is unavailable, so the native layer is an acceleration of the
host data path, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(__file__)
_BUILD = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD, "libuvio_native.so")
_SRCS = [
    os.path.join(_HERE, "select_imu.cpp"),
    os.path.join(_HERE, "csv_loader.cpp"),
]

_lib = None


def _compile() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """ctypes handle to the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
        os.path.getmtime(p) for p in _SRCS
    ):
        if not _compile():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    fn = lib.uvio_select_imu_readings
    fn.restype = ctypes.c_int64
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    fn.argtypes = [
        dp, dp, dp, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        dp, dp, dp,
    ]
    _lib = lib
    return _lib


def select_imu_readings(times, ws, accs, t0, t1, m_max):
    """Native IMU slice+interpolate+pad; None if the library is absent.

    Same contract as `filter.propagator.select_imu_readings_np`.
    """
    lib = get_lib()
    if lib is None:
        return None
    times = np.ascontiguousarray(times, np.float64)
    ws = np.ascontiguousarray(ws, np.float64)
    accs = np.ascontiguousarray(accs, np.float64)
    out_t = np.empty(m_max, np.float64)
    out_w = np.empty((m_max, 3), np.float64)
    out_a = np.empty((m_max, 3), np.float64)
    rc = lib.uvio_select_imu_readings(
        times, ws, accs, len(times), float(t0), float(t1), m_max, out_t, out_w, out_a
    )
    if rc == -1:
        raise AssertionError("backwards propagation request")
    if rc == -2:
        raise ValueError(
            f"IMU batch exceeds max_imu_batch={m_max}; raise the layout limit"
        )
    return out_t, out_w, out_a


def load_csv(path: str):
    """Native one-pass CSV/TUM-text parse -> (rows, cols) float64 array;
    None if the native library is unavailable (callers fall back to the
    Python csv reader). Skips '#'/header/blank lines; ',' or whitespace
    separated."""
    lib = get_lib()
    if lib is None:
        return None
    fn = lib.uvio_csv_load
    fn.restype = ctypes.c_int64
    fn.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.uvio_csv_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    lib.uvio_csv_free.restype = None
    out = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_int64()
    cols = ctypes.c_int64()
    rc = fn(path.encode(), ctypes.byref(out), ctypes.byref(rows), ctypes.byref(cols))
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        raise ValueError(f"ragged csv rows in {path}")
    n = rows.value * cols.value
    if n == 0:
        lib.uvio_csv_free(out)
        return np.zeros((0, max(cols.value, 0)))
    arr = np.ctypeslib.as_array(out, shape=(rows.value, cols.value)).copy()
    lib.uvio_csv_free(out)
    return arr
