"""ctypes bindings for the native geometry kernels.

Compiled on first import (like the reference's import-time `make`,
db_postprocess_fast/__init__.py:7) and cached next to the source; falls
back to pure-numpy implementations in utils.geometry when the toolchain is
unavailable (`native_available()` reports which path is active).
"""

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "geometry_kernels.cpp")
_LIB = os.path.join(_DIR, "libocrgeom.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # some toolchains reject -march=native (e.g. cross/qemu hosts)
        cmd.remove("-march=native")
        subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_LIB)
    except Exception:
        _lib = False
        return False

    lib.min_area_rect.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.min_area_rect.restype = ctypes.c_int
    lib.poly_intersection_area.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.poly_intersection_area.restype = ctypes.c_double
    lib.polygon_area_abs.argtypes = [ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.polygon_area_abs.restype = ctypes.c_double
    lib.iou_matrix.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.iou_matrix.restype = None
    lib.border_distance_field.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.border_distance_field.restype = None
    lib.make_border_map.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_double,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.make_border_map.restype = None
    _lib = lib
    return lib


def native_available():
    return bool(_load())


def _fptr(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def min_area_rect(points):
    """points (N,2) float -> (4x2 corners float32, short side)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native geometry unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float32)
    out = np.empty(8, np.float32)
    sside = ctypes.c_float()
    rc = lib.min_area_rect(_fptr(pts), len(pts), _fptr(out), ctypes.byref(sside))
    if rc != 0:
        raise ValueError("min_area_rect failed")
    return out.reshape(4, 2), float(sside.value)


def poly_intersection_area(a, b):
    lib = _load()
    if not lib:
        raise RuntimeError("native geometry unavailable")
    pa = np.ascontiguousarray(a, dtype=np.float32)
    pb = np.ascontiguousarray(b, dtype=np.float32)
    return float(lib.poly_intersection_area(_fptr(pa), len(pa), _fptr(pb), len(pb)))


def iou_matrix(gt_polys, det_polys):
    """gt_polys (G, P, 2), det_polys (D, Q, 2) float -> (G, D) IoU matrix.
    Entries of -1 flag non-convex/non-convex pairs for the caller to
    recompute with the raster fallback."""
    lib = _load()
    if not lib:
        raise RuntimeError("native geometry unavailable")
    g = np.ascontiguousarray(gt_polys, dtype=np.float32)
    d = np.ascontiguousarray(det_polys, dtype=np.float32)
    out = np.empty((len(g), len(d)), np.float32)
    lib.iou_matrix(
        _fptr(g), len(g), g.shape[1], _fptr(d), len(d), d.shape[1], _fptr(out)
    )
    return out


def border_distance_field(poly, distance, height, width):
    """Min-over-edges law-of-cosines distance field over an (height, width)
    ROI grid (the MakeBorderMap hot loop).  poly (N, 2) in ROI coords.
    Returns (dist_norm clipped to [0,1], absolute min distance), float32."""
    lib = _load()
    if not lib:
        raise RuntimeError("native geometry unavailable")
    p = np.ascontiguousarray(poly, dtype=np.float32)
    dist_norm = np.empty((height, width), np.float32)
    absdist = np.empty((height, width), np.float32)
    lib.border_distance_field(
        _fptr(p), len(p), float(distance), height, width,
        _fptr(dist_norm), _fptr(absdist),
    )
    return dist_norm, absdist


def make_border_map(polys, ignore_tags, shrink_ratio, canvas, mask):
    """Whole-sample MakeBorderMap inner loop: fmax the normalized inverse
    distance field of every non-ignored polygon into `canvas` (values in
    [0,1]) and set `mask` over the dilated band.  polys (N, P, 2);
    canvas/mask float32 (H, W), updated in place."""
    lib = _load()
    if not lib:
        raise RuntimeError("native geometry unavailable")
    p = np.ascontiguousarray(polys, dtype=np.float32)
    ig = np.ascontiguousarray(ignore_tags, dtype=np.uint8)
    assert canvas.dtype == np.float32 and canvas.flags.c_contiguous
    assert mask.dtype == np.float32 and mask.flags.c_contiguous
    h, w = canvas.shape
    lib.make_border_map(
        _fptr(p), len(p), p.shape[1] if len(p) else 0,
        ig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        float(shrink_ratio), h, w, _fptr(canvas), _fptr(mask),
    )
