"""Native (C++) runtime components, built on demand with g++ + ctypes.

The reference's native layer is CUDA kernel-launch glue that XLA subsumes;
the host-side pieces that genuinely benefit from native code in this
framework are CPU-bound mesh operations. This package compiles them lazily
into a cached shared library (no pybind11/cmake needed — one g++ -O3
invocation) and falls back to the NumPy implementations when a compiler is
unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "marching_tets.cpp")
_lib = None
_lib_failed = False


def _build_lib():
    """Compile (or load cached) libpermuto_native.so."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha256(f.read()).hexdigest()[:16]
        cache_dir = os.path.join(tempfile.gettempdir(), "permuto_sdf_tpu_native")
        os.makedirs(cache_dir, exist_ok=True)
        so_path = os.path.join(cache_dir, f"libpermuto_native_{digest}.so")
        if not os.path.exists(so_path):
            tmp = so_path + f".build{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", _SRC, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        lib.marching_tets.restype = ctypes.c_int
        lib.marching_tets.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # values
            ctypes.c_int, ctypes.c_int, ctypes.c_int,  # nx ny nz
            ctypes.c_float,  # level
            ctypes.POINTER(ctypes.c_int32),  # tri_edges
            ctypes.POINTER(ctypes.c_int32),  # n_tris
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # origin
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # spacing
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint32)),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _lib_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _build_lib() is not None


def marching_tetrahedra_native(values: np.ndarray, level: float = 0.0,
                               origin=(0.0, 0.0, 0.0), spacing=(1.0, 1.0, 1.0)):
    """C++ marching tets; same contract as
    ops.marching_cubes.marching_tetrahedra. Raises RuntimeError if the
    native library is unavailable (callers fall back to NumPy)."""
    lib = _build_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")

    from permuto_sdf_tpu.ops.marching_cubes import _TRI_EDGES, _N_TRIS

    values = np.ascontiguousarray(values, dtype=np.float32)
    tri_edges = np.ascontiguousarray(_TRI_EDGES, dtype=np.int32)
    n_tris = np.ascontiguousarray(_N_TRIS, dtype=np.int32)

    out_v = ctypes.POINTER(ctypes.c_float)()
    out_f = ctypes.POINTER(ctypes.c_uint32)()
    nv = ctypes.c_uint32()
    nf = ctypes.c_uint32()
    rc = lib.marching_tets(
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        values.shape[0], values.shape[1], values.shape[2],
        ctypes.c_float(level),
        tri_edges.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_float(origin[0]), ctypes.c_float(origin[1]),
        ctypes.c_float(origin[2]),
        ctypes.c_float(spacing[0]), ctypes.c_float(spacing[1]),
        ctypes.c_float(spacing[2]),
        ctypes.byref(out_v), ctypes.byref(nv),
        ctypes.byref(out_f), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError("marching_tets native call failed")
    try:
        verts = np.ctypeslib.as_array(out_v, (nv.value, 3)).copy() if nv.value else np.zeros((0, 3), np.float32)
        faces = np.ctypeslib.as_array(out_f, (nf.value, 3)).astype(np.int64) if nf.value else np.zeros((0, 3), np.int64)
    finally:
        lib.mt_free(out_v)
        lib.mt_free(out_f)
    return verts, faces
