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

    lib.qwbc_qp_assembly.argtypes = (
        [ctypes.c_int, ip] + [dp] * 6 + [ctypes.c_int, ip] + [dp] * 7
        + [ctypes.c_int, ctypes.c_int] + [dp] * 2
    )
    lib.qwbc_qp_assembly.restype = None

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


def oracle_qp_assembly(model, params, obs, ref, carry, switch_flag, deriv_valid):
    """Independent C++ re-derivation of the full WBC QP assembly
    (reference whole_body_controller.cpp:256-320,384-515; JAX side
    control/wbc.wbc_setup).  Closes the last self-referential link in the
    torque-parity chain: the centroidal transform + H/g/A/l/u assembly is
    otherwise only validated by two same-author implementations.

    obs: RobotObservation; ref: Reference (contacts already resolved);
    carry: WBCCarry (qp_warm ignored).  Returns a dict with the QP data and
    the carry updates for chaining multi-cycle runs, or None when the
    native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    f64 = lambda x: np.ascontiguousarray(np.asarray(x), dtype=np.float64)
    i32 = lambda x: np.ascontiguousarray(np.asarray(x), dtype=np.int32)
    ipp = ctypes.POINTER(ctypes.c_int32)
    refs = np.concatenate([
        f64(ref.com_pose), f64(ref.com_vel), f64(ref.com_acc),
        f64(ref.swing_pos), f64(ref.swing_vel), f64(ref.swing_acc),
        f64(ref.contacts),
    ])
    carry_packed = np.concatenate([
        f64(carry.old_T).ravel(), f64(carry.old_J_st).ravel(),
        f64(carry.old_J_sw).ravel(), f64(carry.tdot_inv).ravel(),
        f64(carry.integral_error),
    ])
    par = np.array([
        params.kp, params.kp_z, params.kd, params.ki, params.kp_swing,
        params.kd_swing, params.friction, params.max_torque,
        params.slack_weight, params.loop_rate, 1.0e20,
    ])
    outs = np.zeros(42 * 42 + 42 + 70 * 42 + 70 + 70 + 18 + 324 + 216 + 216 + 324 + 6)
    lib.qwbc_qp_assembly(
        model.num_bodies,
        i32(model.parent).ctypes.data_as(ipp),
        _dptr(f64(model.joint_R)), _dptr(f64(model.joint_p)),
        _dptr(f64(model.joint_axis)), _dptr(f64(model.mass)),
        _dptr(f64(model.com)), _dptr(f64(model.inertia)),
        len(model.frame_body),
        i32(model.frame_body).ctypes.data_as(ipp),
        _dptr(f64(model.frame_p)),
        _dptr(f64(obs.base_R)), _dptr(f64(obs.base_p)), _dptr(f64(obs.q)),
        _dptr(f64(np.concatenate([f64(obs.base_vel), f64(obs.qd)]))),
        _dptr(refs), _dptr(carry_packed),
        int(switch_flag), int(deriv_valid), _dptr(par), _dptr(outs),
    )
    o, out = 0, {}
    for name, shape in [
        ("H", (42, 42)), ("g", (42,)), ("A", (70, 42)), ("l", (70,)),
        ("u", (70,)), ("h_c", (18,)), ("T", (18, 18)), ("Jc_st", (12, 18)),
        ("Jc_sw", (12, 18)), ("tdot_inv", (18, 18)), ("integral_error", (6,)),
    ]:
        n = int(np.prod(shape))
        out[name] = outs[o:o + n].reshape(shape)
        o += n
    return out


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
