"""Native (C++) runtime components, loaded via ctypes.

Builds `libreart_native.so` from the bundled sources on first use (g++),
caching it next to this file. Every entry point has a pure-python/scipy
fallback so the framework still works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SOURCES = ["lap.cpp"]
_LIB_PATH = os.path.join(_HERE, "libreart_native.so")
_HOST_TAG_PATH = _LIB_PATH + ".host"
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _host_tag() -> str:
    """CPU-feature fingerprint. -march=native code is only valid on the CPU
    that built it, and THIS environment's VM live-migrates between hosts with
    different feature sets (observed 2026-08-18: XLA AOT-cache machine-feature
    mismatch after a migration) — so the .so is rebuilt whenever the visible
    flags change, not just when the sources do."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    import hashlib

                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(flags.encode()).hexdigest()[:16]
    except Exception:
        pass
    return "unknown"


def _build() -> bool:
    srcs = [os.path.join(_HERE, s) for s in _SOURCES if os.path.exists(os.path.join(_HERE, s))]
    base = ["-shared", "-fPIC", "-std=c++17", "-pthread", *srcs,
            "-o", _LIB_PATH]
    # -march=native is safe (the .so is built on first use on THIS host,
    # never shipped) and measured ~15% faster on the JV scan loops; fall
    # back to plain -O3 for compilers/platforms that reject it
    for opt in (["-O3", "-march=native", "-funroll-loops"], ["-O3"]):
        try:
            subprocess.run(["g++", *opt, *base], check=True,
                           capture_output=True, timeout=240)
            with open(_HOST_TAG_PATH, "w") as f:
                f.write(_host_tag())
            return True
        except Exception:
            continue
    return False


def _stale() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    try:
        with open(_HOST_TAG_PATH) as f:
            if f.read().strip() != _host_tag():
                return True  # built on a different CPU (VM migration)
    except OSError:
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_HERE, s)) > lib_mtime
        for s in _SOURCES
        if os.path.exists(os.path.join(_HERE, s))
    )


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if _BUILD_FAILED:
            return None
        if _stale() and not _build():
            _BUILD_FAILED = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _BUILD_FAILED = True
            return None
        lib.lap_solve_batch.restype = ctypes.c_int
        lib.lap_solve_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        if hasattr(lib, "lap_points_batch"):
            lib.lap_points_batch.restype = ctypes.c_int
            lib.lap_points_batch.argtypes = [
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ]
        _LIB = lib
        return _LIB


def lap_solve_batch(cost: np.ndarray) -> np.ndarray:
    """Exact LAP on (B, N, M) float costs -> row_to_col (B, N) int32.

    Native JV when available; scipy fallback otherwise. (Replaces the
    reference's parallel_lap multiprocessing fan-out.)
    """
    cost = np.ascontiguousarray(cost, dtype=np.float32)
    if cost.ndim == 2:
        cost = cost[None]
    b, n, m = cost.shape
    lib = get_lib()
    if lib is not None:
        out = np.empty((b, n), dtype=np.int32)
        rc = lib.lap_solve_batch(
            b, n, m,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment

    out = np.empty((b, n), dtype=np.int32)
    for k in range(b):
        rows, cols = linear_sum_assignment(cost[k])
        out[k, rows] = cols
    return out


def lap_solve_points(src: np.ndarray, tgt: np.ndarray,
                     v_init: np.ndarray | None = None) -> np.ndarray:
    """Exact LAP under euclidean point-pair costs. src (B, N, 3),
    tgt (B, M, 3), optional initial column duals v_init (B, M) (e.g. negated
    TPU-auction prices) -> row_to_col (B, N) int32.

    Cost rows are materialized lazily INSIDE the solver (never the full
    (B, N, M) matrix — 600 MB at nao-energy scale), and warm duals let each
    augmentation's shortest-path tree terminate early. Falls back to the
    materialized-cost path when the native library is unavailable."""
    src = np.ascontiguousarray(src, dtype=np.float32)
    tgt = np.ascontiguousarray(tgt, dtype=np.float32)
    if src.ndim == 2:
        src, tgt = src[None], tgt[None]
        if v_init is not None:
            v_init = v_init[None]
    b, n, _ = src.shape
    m = tgt.shape[1]
    lib = get_lib()
    if lib is not None and hasattr(lib, "lap_points_batch"):
        out = np.empty((b, n), dtype=np.int32)
        vp = None
        if v_init is not None:
            v_init = np.ascontiguousarray(v_init, dtype=np.float32)
            assert v_init.shape == (b, m), v_init.shape
            vp = v_init.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        rc = lib.lap_points_batch(
            b, n, m,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            tgt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            vp,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    diff = src[:, :, None, :] - tgt[:, None, :, :]
    return lap_solve_batch(np.sqrt((diff ** 2).sum(-1)))
