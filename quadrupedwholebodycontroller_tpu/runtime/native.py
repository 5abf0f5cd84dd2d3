"""ctypes bindings to the first-party native library (native/).

Components:
  * dynamics oracle — independent C++ Featherstone CRBA/RNEA used as the
    trusted cross-check for the JAX dynamics engine (the role iDynTree plays
    for the reference controller)
  * trajectory log — host-side binary recorder replacing rosbag record

The library is built on first use with `make` (g++); callers should treat
`load()` returning None as "native layer unavailable" and fall back.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libqwbc_native.so")


@lru_cache(maxsize=1)
def load():
    """Build (if needed) and load the native library; None if unavailable."""
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-j2"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int32)
    lib.qwbc_mass_and_bias.argtypes = [ctypes.c_int, ip] + [dp] * 11
    lib.qwbc_mass_and_bias.restype = None

    lib.qwbc_trajlog_create.argtypes = [ctypes.c_uint32, ctypes.c_uint64]
    lib.qwbc_trajlog_create.restype = ctypes.c_void_p
    lib.qwbc_trajlog_append_many.argtypes = [ctypes.c_void_p, dp, ctypes.c_uint64]
    lib.qwbc_trajlog_num_frames.argtypes = [ctypes.c_void_p]
    lib.qwbc_trajlog_num_frames.restype = ctypes.c_uint64
    lib.qwbc_trajlog_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.qwbc_trajlog_flush.restype = ctypes.c_int
    lib.qwbc_trajlog_read.argtypes = [
        ctypes.c_char_p, dp, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32)
    ]
    lib.qwbc_trajlog_read.restype = ctypes.c_int64
    lib.qwbc_trajlog_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def oracle_mass_and_bias(model, base_R, q, u):
    """C++ Featherstone M(q) and Coriolis bias in mixed representation.

    model: RobotModel (any dtype; converted to f64).  Returns (M, h) numpy
    f64 or None when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    nb = model.num_bodies
    nv = model.nv
    f64 = lambda x: np.ascontiguousarray(np.asarray(x), dtype=np.float64)
    parent = np.asarray(model.parent, dtype=np.int32)
    M = np.zeros((nv, nv))
    h = np.zeros(nv)
    lib.qwbc_mass_and_bias(
        nb,
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _dptr(f64(model.joint_R)),
        _dptr(f64(model.joint_p)),
        _dptr(f64(model.joint_axis)),
        _dptr(f64(model.mass)),
        _dptr(f64(model.com)),
        _dptr(f64(model.inertia)),
        _dptr(f64(base_R)),
        _dptr(f64(q)),
        _dptr(f64(u)),
        _dptr(M),
        _dptr(h),
    )
    return M, h


class TrajLog:
    """Host-side binary trajectory recorder (rosbag replacement)."""

    def __init__(self, frame_doubles: int, reserve_frames: int = 1 << 16):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._handle = self._lib.qwbc_trajlog_create(frame_doubles, reserve_frames)
        self._frame_doubles = frame_doubles

    def append(self, frames: np.ndarray):
        frames = np.ascontiguousarray(frames, dtype=np.float64)
        n = frames.size // self._frame_doubles
        assert frames.size == n * self._frame_doubles
        self._lib.qwbc_trajlog_append_many(self._handle, _dptr(frames), n)

    def __len__(self):
        return int(self._lib.qwbc_trajlog_num_frames(self._handle))

    def flush(self, path: str):
        rc = self._lib.qwbc_trajlog_flush(self._handle, path.encode())
        if rc != 0:
            raise IOError(f"trajlog flush failed: {rc}")

    def close(self):
        if self._handle:
            self._lib.qwbc_trajlog_destroy(self._handle)
            self._handle = None

    @staticmethod
    def read(path: str) -> np.ndarray:
        lib = load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        fd = ctypes.c_uint32()
        n = lib.qwbc_trajlog_read(path.encode(), None, 0, ctypes.byref(fd))
        if n < 0:
            raise IOError(f"trajlog read failed: {n}")
        out = np.zeros(n * fd.value)
        lib.qwbc_trajlog_read(path.encode(), _dptr(out), out.size, None)
        return out.reshape(n, fd.value)
