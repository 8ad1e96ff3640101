"""ctypes binding for the native data-loading library (native/fpsg_io.cpp).

Auto-builds via ``make -C native`` on first use when a toolchain is present;
every entry point has a pure-Python fallback in fpsg_tpu.data, so the
framework works without the native library (it is a host-side preload
accelerator, not a correctness dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native"
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libfpsg_io.so")
_lib = None
_load_failed = False


def _try_build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.fpsg_read_ply.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int]
    lib.fpsg_read_ply.restype = ctypes.c_int
    lib.fpsg_pad_normalize.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
    lib.fpsg_load_ply_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_int, i32p]
    lib.fpsg_load_ply_batch.restype = ctypes.c_int
    lib.fpsg_read_off.argtypes = [
        ctypes.c_char_p, f32p, ctypes.c_int, i32p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fpsg_read_off.restype = ctypes.c_int
    lib.fpsg_sample_mesh.argtypes = [
        f32p, ctypes.c_int, i32p, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_uint64]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def read_ply(path: str, n_pts: int = 2048) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((n_pts, 3), np.float32)
    n = lib.fpsg_read_ply(path.encode(), out, n_pts)
    if n < 0:
        raise IOError(f"native PLY parse failed: {path}")
    return out[:n]


def load_ply_batch(
    paths: List[str],
    n_pts: int = 2048,
    normalize: bool = True,
    seed: int = 0,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Threaded batch PLY load → ((n_files, n_pts, 3) f32, status (n,))."""
    lib = get_lib()
    assert lib is not None, "native library unavailable"
    out = np.zeros((len(paths), n_pts, 3), np.float32)
    status = np.zeros(len(paths), np.int32)
    joined = "\n".join(paths).encode()
    ok = lib.fpsg_load_ply_batch(
        joined, len(paths), out, n_pts, int(normalize), seed, n_threads,
        status,
    )
    if ok < 0:
        raise IOError("native batch load failed")
    return out, status


def read_off(
    path: str, cap_v: int = 300000, cap_f: int = 600000
) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    assert lib is not None
    verts = np.zeros((cap_v, 3), np.float32)
    faces = np.zeros((cap_f, 3), np.int32)
    nv, nf = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.fpsg_read_off(
        path.encode(), verts, cap_v, faces, cap_f,
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc == -2:
        return read_off(path, cap_v * 4, cap_f * 4)
    if rc != 0:
        raise IOError(f"native OFF parse failed: {path}")
    return verts[: nv.value].copy(), faces[: nf.value].copy()


def sample_mesh(
    verts: np.ndarray, faces: np.ndarray, n_points: int, seed: int = 0
) -> np.ndarray:
    lib = get_lib()
    assert lib is not None
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    out = np.zeros((n_points, 3), np.float32)
    lib.fpsg_sample_mesh(
        verts, len(verts), faces, len(faces), out, n_points, seed
    )
    return out
