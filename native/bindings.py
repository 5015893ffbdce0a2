"""ctypes bindings for the native runtime core (native/runtime.cpp).

Builds on demand (cmake+ninja, falling back to a direct g++ invocation) and
degrades gracefully: `load()` returns None when no toolchain is available,
and callers fall back to the pure-Python implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB = _DIR / "lib" / "libresilient_runtime.so"
_cache = {"lib": None, "tried": False}


def build() -> bool:
    build_dir = _DIR / "build"
    build_dir.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-G", "Ninja", ".."],
            cwd=build_dir, check=True, capture_output=True,
        )
        subprocess.run(
            ["ninja"], cwd=build_dir, check=True, capture_output=True
        )
        return _LIB.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        pass
    try:  # direct g++ fallback
        _LIB.parent.mkdir(exist_ok=True)
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
             str(_DIR / "runtime.cpp"), "-o", str(_LIB)],
            check=True, capture_output=True,
        )
        return _LIB.exists()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load():
    if _cache["tried"]:
        return _cache["lib"]
    _cache["tried"] = True
    if not _LIB.exists() and not build():
        return None
    lib = ctypes.CDLL(str(_LIB))
    d = ctypes.POINTER(ctypes.c_double)
    f = ctypes.POINTER(ctypes.c_float)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    lib.frp_interpolate_command.restype = ctypes.c_int
    lib.frp_interpolate_command.argtypes = [
        d, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, d,
    ]
    lib.frp_init_yaw_rate.restype = ctypes.c_double
    lib.frp_init_yaw_rate.argtypes = [ctypes.c_double] * 3
    lib.frp_postprocess_output.restype = None
    lib.frp_postprocess_output.argtypes = [d, ctypes.c_int]
    lib.frp_raycast_update.restype = None
    lib.frp_raycast_update.argtypes = [
        f, ctypes.c_int, ctypes.c_int, ctypes.c_int, d, ctypes.c_double,
        d, u8, ctypes.c_int, d, ctypes.c_double, ctypes.c_double,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.frp_ring_create.restype = ctypes.c_void_p
    lib.frp_ring_create.argtypes = [ctypes.c_int]
    lib.frp_ring_destroy.restype = None
    lib.frp_ring_destroy.argtypes = [ctypes.c_void_p]
    lib.frp_ring_push.restype = None
    lib.frp_ring_push.argtypes = [ctypes.c_void_p, d, ctypes.c_double]
    lib.frp_ring_latest.restype = ctypes.c_int
    lib.frp_ring_latest.argtypes = [ctypes.c_void_p, d, d]
    lib.frp_ring_command.restype = ctypes.c_int
    lib.frp_ring_command.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, d,
    ]
    _cache["lib"] = lib
    return lib


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def interpolate_command(mpc_output: np.ndarray, t_since_mpc: float,
                        dt: float, mass: float, g: float):
    """Returns cmd array [pos3, vel3, acc3, rates3, yaw, thrust] or None."""
    lib = load()
    if lib is None:
        return None
    out = np.zeros(14)
    mo = np.ascontiguousarray(mpc_output, dtype=np.float64)
    ok = lib.frp_interpolate_command(
        _dp(mo), mo.shape[0], t_since_mpc, dt, mass, g, _dp(out)
    )
    return out if ok else None


def postprocess_output(mpc_output: np.ndarray, n_stages: int) -> np.ndarray:
    lib = load()
    mo = np.ascontiguousarray(mpc_output, dtype=np.float64)
    lib.frp_postprocess_output(_dp(mo), n_stages)
    return mo


class CommandRing:
    """Lock-free latest-solution hand-off between the 20 Hz solver loop and
    the 100 Hz commander (native seqlock; see runtime.cpp frp_ring_*).

    Replaces the reference's unsynchronized shared deque
    (nmpc_solver.cpp:527 / 865-987 across spinner threads).
    Returns None from the constructor path if no native toolchain exists —
    callers fall back to Python-side hand-off.
    """

    def __init__(self, n_stages: int, nvar: int = 17):
        lib = load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        self.n_stages = n_stages
        self.stride = (n_stages + 1) * nvar
        self._h = lib.frp_ring_create(self.stride)

    def push(self, mpc_output: np.ndarray, t_start: float) -> None:
        mo = np.ascontiguousarray(mpc_output, dtype=np.float64)
        assert mo.size == self.stride, (mo.size, self.stride)
        self._lib.frp_ring_push(self._h, _dp(mo), t_start)

    def latest(self):
        out = np.zeros(self.stride)
        t = ctypes.c_double()
        ok = self._lib.frp_ring_latest(self._h, _dp(out), ctypes.byref(t))
        if not ok:
            return None
        return out.reshape(self.n_stages + 1, -1), t.value

    def command(self, t_now: float, dt: float, mass: float, g: float):
        """Latest snapshot + interpolation in one native call.  Returns the
        14-dim command [pos3, vel3, acc3, rates3, yaw, thrust] or None."""
        cmd = np.zeros(14)
        ok = self._lib.frp_ring_command(
            self._h, self.n_stages + 1, t_now, dt, mass, g, _dp(cmd)
        )
        return cmd if ok else None

    def __del__(self):
        try:
            self._lib.frp_ring_destroy(self._h)
        except Exception:
            pass


def raycast_update(grid: np.ndarray, origin, resolution: float,
                   points: np.ndarray, valid: np.ndarray, cam,
                   min_ray, max_ray, hit_log, miss_log, clamp_min, clamp_max):
    lib = load()
    g = np.ascontiguousarray(grid, dtype=np.float32)
    pts = np.ascontiguousarray(points, dtype=np.float64)
    v = np.ascontiguousarray(valid, dtype=np.uint8)
    o = np.ascontiguousarray(origin, dtype=np.float64)
    c = np.ascontiguousarray(cam, dtype=np.float64)
    lib.frp_raycast_update(
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        g.shape[0], g.shape[1], g.shape[2], _dp(o), resolution,
        _dp(pts), v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(pts), _dp(c), min_ray, max_ray,
        hit_log, miss_log, clamp_min, clamp_max,
    )
    return g
