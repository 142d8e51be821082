"""ctypes bindings for the native C++ host components, with auto-build.

The shared library is compiled on first use (g++ -O2, links zlib); if the
toolchain or build fails, callers fall back to the pure-Python
implementations (xr/core/image.py, xr/scene/objio.py) — parity between the
two is covered by tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "xr_native.cpp")
_LIB = os.path.join(_HERE, "libxr_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


class _XrObjMesh(ctypes.Structure):
    _fields_ = [
        ("positions", ctypes.POINTER(ctypes.c_float)),
        ("normals", ctypes.POINTER(ctypes.c_float)),
        ("uvs", ctypes.POINTER(ctypes.c_float)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("face_mat", ctypes.POINTER(ctypes.c_int32)),
        ("num_vertices", ctypes.c_int64),
        ("num_tris", ctypes.c_int64),
        ("num_materials", ctypes.c_int32),
        ("mat_names", ctypes.c_char_p),
        ("error", ctypes.c_char_p),
    ]


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library. Returns its path or None on failure."""
    if os.path.exists(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            [
                "g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                _SRC, "-o", _LIB, "-lz",
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB
    except Exception:
        return None


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.xr_obj_parse_file.restype = ctypes.POINTER(_XrObjMesh)
        lib.xr_obj_parse_file.argtypes = [ctypes.c_char_p]
        lib.xr_obj_free.argtypes = [ctypes.POINTER(_XrObjMesh)]
        lib.xr_write_png.restype = ctypes.c_int
        lib.xr_write_png.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.xr_build_mips.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def parse_obj(path: str):
    """Parse an OBJ file natively. Returns dict of arrays + material names,
    or None if the native lib is unavailable."""
    lib = load()
    if lib is None:
        return None
    mp = lib.xr_obj_parse_file(path.encode())
    m = mp.contents
    try:
        if m.error:
            raise IOError(f"OBJ parse failed: {m.error.decode()}")
        v, t = int(m.num_vertices), int(m.num_tris)

        def arr(ptr, n, dt):
            if n == 0:
                return np.zeros(0, dt)
            return np.ctypeslib.as_array(ptr, shape=(n,)).astype(dt, copy=True)

        return {
            "positions": arr(m.positions, v * 3, np.float32).reshape(v, 3),
            "normals": arr(m.normals, v * 3, np.float32).reshape(v, 3),
            "uvs": arr(m.uvs, v * 2, np.float32).reshape(v, 2),
            "indices": arr(m.indices, t * 3, np.int32).reshape(t, 3),
            "face_mat": arr(m.face_mat, t, np.int32),
            "materials": (m.mat_names or b"default").decode().split("\n"),
        }
    finally:
        lib.xr_obj_free(mp)


def write_png(path: str, image: np.ndarray) -> bool:
    """Native PNG encode; returns False if unavailable (caller falls back)."""
    lib = load()
    if lib is None:
        return False
    img = np.ascontiguousarray(image, np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    assert c == 3
    rc = lib.xr_write_png(path.encode(), img.ctypes.data_as(ctypes.c_char_p), h, w)
    return rc == 0


def build_mips(image: np.ndarray) -> Optional[np.ndarray]:
    """Native flattened mip pyramid for one (S, S, 3) f32 texture."""
    lib = load()
    if lib is None:
        return None
    img = np.ascontiguousarray(image, np.float32)
    s = img.shape[0]
    assert img.shape == (s, s, 3) and s & (s - 1) == 0
    total = sum((max(s >> k, 1)) ** 2 for k in range(s.bit_length()))
    out = np.empty((total, 3), np.float32)
    lib.xr_build_mips(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
