"""ctypes bindings to the native C++ runtime (native/libtpt_native.so).

Provides the fast host paths the reference keeps in C++ — OBJ parsing and
BVH building — with automatic, silent fallback to the pure-Python
implementations when the shared library has not been built. Build it with
`make -C native` (g++ only; no pybind11 needed).
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .logger import get_logger

log = get_logger("Native")

_LIB = None
_TRIED = False


def _find_lib():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    candidates = [
        os.environ.get("TPT_NATIVE_LIB", ""),
        os.path.join(here, "native", "libtpt_native.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def get_lib():
    """The loaded library or None (fallback to Python)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _find_lib()
    if path is None:
        log.debug("libtpt_native.so not built; using Python fallbacks")
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:  # pragma: no cover
        log.warning("failed to load %s: %s", path, e)
        return None

    lib.tpt_load_obj.restype = ctypes.c_void_p
    lib.tpt_load_obj.argtypes = [ctypes.c_char_p]
    lib.tpt_mesh_num_prims.restype = ctypes.c_int32
    lib.tpt_mesh_num_prims.argtypes = [ctypes.c_void_p]
    lib.tpt_mesh_error.restype = ctypes.c_char_p
    lib.tpt_mesh_error.argtypes = [ctypes.c_void_p]
    lib.tpt_mesh_fill.argtypes = [ctypes.c_void_p] + [
        ctypes.c_void_p
    ] * 6
    lib.tpt_mesh_free.argtypes = [ctypes.c_void_p]

    lib.tpt_build_bvh.restype = ctypes.c_void_p
    lib.tpt_build_bvh.argtypes = [
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
    ]
    lib.tpt_bvh_num_nodes.restype = ctypes.c_int32
    lib.tpt_bvh_num_nodes.argtypes = [ctypes.c_void_p]
    lib.tpt_bvh_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 6
    lib.tpt_bvh_free.argtypes = [ctypes.c_void_p]

    _LIB = lib
    log.info("native runtime loaded: %s", path)
    return _LIB


def native_load_obj(path: str):
    """Parse an OBJ via C++; returns the PrimList field dict or None when
    the native library is unavailable. Raises ValueError on parse errors
    (matching the Python loader)."""
    lib = get_lib()
    if lib is None:
        return None
    handle = lib.tpt_load_obj(path.encode())
    try:
        err = lib.tpt_mesh_error(handle)
        n = lib.tpt_mesh_num_prims(handle)
        if err is not None and n == 0:
            raise ValueError(err.decode())
        corners = np.empty((n, 4, 3), np.float32)
        is_quad = np.empty(n, np.uint8)
        albedo = np.empty((n, 3), np.float32)
        emission = np.empty((n, 3), np.float32)
        material = np.empty(n, np.int32)
        normal = np.empty((n, 3), np.float32)
        lib.tpt_mesh_fill(
            handle,
            corners.ctypes.data, is_quad.ctypes.data,
            albedo.ctypes.data, emission.ctypes.data,
            material.ctypes.data, normal.ctypes.data,
        )
        return dict(
            corners=corners,
            is_quad=is_quad.astype(bool),
            albedo=albedo,
            emission=emission,
            material=material,
            normal=normal,
        )
    finally:
        lib.tpt_mesh_free(handle)


def native_build_bvh(tmin: np.ndarray, tmax: np.ndarray,
                     leaf_size: int = 4):
    """Build a BVH via C++; returns flat-array dict or None."""
    lib = get_lib()
    if lib is None:
        return None
    t = tmin.shape[0]
    tmin = np.ascontiguousarray(tmin, np.float32)
    tmax = np.ascontiguousarray(tmax, np.float32)
    handle = lib.tpt_build_bvh(
        t, tmin.ctypes.data, tmax.ctypes.data, leaf_size
    )
    try:
        m = lib.tpt_bvh_num_nodes(handle)
        node_min = np.empty((m, 3), np.float32)
        node_max = np.empty((m, 3), np.float32)
        node_left = np.empty(m, np.int32)
        node_right = np.empty(m, np.int32)
        node_count = np.empty(m, np.int32)
        tri_order = np.empty(t, np.int32)
        lib.tpt_bvh_fill(
            handle,
            node_min.ctypes.data, node_max.ctypes.data,
            node_left.ctypes.data, node_right.ctypes.data,
            node_count.ctypes.data, tri_order.ctypes.data,
        )
        return dict(
            node_min=node_min, node_max=node_max,
            node_left=node_left, node_right=node_right,
            node_count=node_count, tri_order=tri_order,
        )
    finally:
        lib.tpt_bvh_free(handle)
