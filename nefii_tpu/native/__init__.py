"""ctypes bindings for the native geometry runtime (mesh SDF + marching).

Builds libnefii_native.so on first use (g++ -O3 -fopenmp); the .so is cached
next to the sources and rebuilt when they change. See mesh_sdf.cpp /
marching.cpp for what this replaces from the reference's dependency stack.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libnefii_native.so")
_SOURCES = [os.path.join(_DIR, "mesh_sdf.cpp"), os.path.join(_DIR, "marching.cpp")]

_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-o", _SO, *_SOURCES,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    need_build = not os.path.exists(_SO) or any(
        os.path.getmtime(src) > os.path.getmtime(_SO) for src in _SOURCES
    )
    if need_build:
        _build()
    lib = ctypes.CDLL(_SO)

    lib.mesh_create.restype = ctypes.c_void_p
    lib.mesh_create.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.mesh_free.argtypes = [ctypes.c_void_p]
    lib.mesh_total_area.restype = ctypes.c_double
    lib.mesh_total_area.argtypes = [ctypes.c_void_p]
    lib.mesh_signed_distance.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mesh_sample_surface.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.marching_tetrahedra.restype = ctypes.c_int64
    lib.marching_tetrahedra.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _lib = lib
    return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class MeshSDF:
    """BVH signed-distance field + surface sampler over a triangle mesh."""

    def __init__(self, vertices: np.ndarray, faces: np.ndarray):
        self._lib = get_lib()
        v = np.ascontiguousarray(vertices, np.float64)
        f = np.ascontiguousarray(faces, np.int32)
        assert v.ndim == 2 and v.shape[1] == 3
        assert f.ndim == 2 and f.shape[1] == 3
        self._handle = self._lib.mesh_create(
            v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(v),
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(f),
        )
        self.n_vertices = len(v)
        self.n_faces = len(f)

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.mesh_free(self._handle)
            self._handle = None

    @property
    def total_area(self) -> float:
        return self._lib.mesh_total_area(self._handle)

    def signed_distance(self, points: np.ndarray) -> np.ndarray:
        p = np.ascontiguousarray(points, np.float32)
        out = np.empty(len(p), np.float32)
        self._lib.mesh_signed_distance(self._handle, _fptr(p), len(p), _fptr(out))
        return out

    def sample_surface(self, n: int, seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        pts = np.empty((n, 3), np.float32)
        normals = np.empty((n, 3), np.float32)
        self._lib.mesh_sample_surface(self._handle, n, seed, _fptr(pts), _fptr(normals))
        return pts, normals


def marching_tetrahedra(grid: np.ndarray, iso: float = 0.0) -> np.ndarray:
    """Extract the iso-surface of a [nx,ny,nz] grid -> triangles [T,3,3]
    in grid-index coordinates."""
    lib = get_lib()
    g = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = g.shape
    max_tris = 4 * nx * ny * nz  # generous; one retry if it overflows
    out = np.empty((max_tris, 9), np.float32)
    n = lib.marching_tetrahedra(_fptr(g), nx, ny, nz, iso, _fptr(out), max_tris)
    if n > max_tris:
        out = np.empty((n, 9), np.float32)
        n = lib.marching_tetrahedra(_fptr(g), nx, ny, nz, iso, _fptr(out), n)
    return out[:n].reshape(n, 3, 3)
