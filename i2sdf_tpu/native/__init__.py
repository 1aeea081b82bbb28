"""ctypes bindings for the host-side C++ modules.

Builds `libi2sdf_native.so` on first use (g++ -O3, cached next to the
sources). The modules replace the reference's native wheel dependencies
(SURVEY.md §2a): marching cubes (skimage), KD-tree NN (sklearn), TSDF
fusion (open3d), depth rasterization (pyrender/EGL).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "libi2sdf_native.so")
_SOURCES = ["marching.cpp", "kdtree.cpp", "tsdf.cpp", "raster.cpp",
            "exr.cpp"]

_lock = threading.Lock()
_lib = None


def _build() -> None:
    srcs = [os.path.join(_SRC_DIR, s) for s in _SOURCES]
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _LIB_PATH] + srcs + ["-lz"]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    return any(
        os.path.getmtime(os.path.join(_SRC_DIR, s)) > lib_mtime
        for s in _SOURCES + ["common.h"])


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            if _needs_build():
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
            _declare(lib)
            _lib = lib
    return _lib


def _declare(lib: ctypes.CDLL) -> None:
    c_fp = ctypes.POINTER(ctypes.c_float)
    c_ip = ctypes.POINTER(ctypes.c_int32)

    lib.i2sdf_free.argtypes = [ctypes.c_void_p]

    lib.i2sdf_marching_tetrahedra.restype = ctypes.c_int
    lib.i2sdf_marching_tetrahedra.argtypes = [
        c_fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.POINTER(c_fp), ctypes.POINTER(c_ip),
        c_ip, c_ip,
    ]

    lib.i2sdf_nn_distances.restype = ctypes.c_int
    lib.i2sdf_nn_distances.argtypes = [
        c_fp, ctypes.c_int32, c_fp, ctypes.c_int32, c_fp]

    lib.i2sdf_tsdf_integrate.restype = ctypes.c_int
    lib.i2sdf_tsdf_integrate.argtypes = [
        c_fp, c_fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        c_fp, ctypes.c_int, ctypes.c_int, c_fp, c_fp,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.i2sdf_tsdf_mask_unobserved.argtypes = [
        c_fp, c_fp, ctypes.c_int64, ctypes.c_float]

    lib.i2sdf_rasterize_depth.restype = ctypes.c_int
    lib.i2sdf_rasterize_depth.argtypes = [
        c_fp, ctypes.c_int32, c_ip, ctypes.c_int32, c_fp, c_fp,
        ctypes.c_int, ctypes.c_int, c_fp,
    ]

    lib.i2sdf_exr_read.restype = ctypes.c_int
    lib.i2sdf_exr_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(c_fp), c_ip, c_ip, c_ip,
        ctypes.c_char_p,
    ]
    lib.i2sdf_exr_write.restype = ctypes.c_int
    lib.i2sdf_exr_write.argtypes = [
        ctypes.c_char_p, c_fp, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32, ctypes.c_int32,
    ]


def _as_f32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


def _as_i32(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int32)


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def marching_cubes(grid, level: float = 0.0, origin=(0.0, 0.0, 0.0),
                   spacing=(1.0, 1.0, 1.0)):
    """Extract the `level` isosurface of a dense (nx, ny, nz) grid.

    Returns (verts (V, 3) float32 world coords, tris (T, 3) int32).
    """
    lib = get_lib()
    grid = _as_f32(grid)
    nx, ny, nz = grid.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int32()
    nt = ctypes.c_int32()
    rc = lib.i2sdf_marching_tetrahedra(
        _fp(grid), nx, ny, nz, level,
        float(origin[0]), float(origin[1]), float(origin[2]),
        float(spacing[0]), float(spacing[1]), float(spacing[2]),
        ctypes.byref(verts_p), ctypes.byref(tris_p),
        ctypes.byref(nv), ctypes.byref(nt))
    if rc != 0:
        raise RuntimeError("marching tetrahedra failed")
    try:
        verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tris_p, (nt.value, 3)).copy()
    finally:
        lib.i2sdf_free(verts_p)
        lib.i2sdf_free(tris_p)
    return verts, tris


def nn_distances(ref, query) -> np.ndarray:
    """Distance from each query point to its nearest ref point (KD-tree)."""
    lib = get_lib()
    ref = _as_f32(ref).reshape(-1, 3)
    query = _as_f32(query).reshape(-1, 3)
    out = np.empty(query.shape[0], np.float32)
    rc = lib.i2sdf_nn_distances(_fp(ref), ref.shape[0], _fp(query),
                                query.shape[0], _fp(out))
    if rc != 0:
        raise RuntimeError("nn_distances failed (empty reference?)")
    return out


class TSDFVolume:
    """Dense TSDF fusion volume (voxel_size, sdf_trunc as in the
    reference's refuse: 0.01 / 0.05 world units, mesh_util.py:93-97)."""

    def __init__(self, origin, dims, voxel_size: float,
                 sdf_trunc: float = 0.05, depth_max: float = 10.0):
        self.origin = np.asarray(origin, np.float32)
        self.dims = tuple(int(d) for d in dims)
        self.voxel_size = float(voxel_size)
        self.sdf_trunc = float(sdf_trunc)
        self.depth_max = float(depth_max)
        n = self.dims[0] * self.dims[1] * self.dims[2]
        self.tsdf = np.zeros(self.dims, np.float32).reshape(-1)
        self.weight = np.zeros(n, np.float32)

    def integrate(self, depth, K, w2c) -> None:
        lib = get_lib()
        depth = _as_f32(depth)
        K33 = _as_f32(np.asarray(K)[:3, :3])
        w2c44 = _as_f32(np.asarray(w2c)[:4, :4])
        h, w = depth.shape
        rc = lib.i2sdf_tsdf_integrate(
            _fp(self.tsdf), _fp(self.weight),
            self.dims[0], self.dims[1], self.dims[2],
            float(self.origin[0]), float(self.origin[1]),
            float(self.origin[2]), self.voxel_size,
            _fp(depth), h, w, _fp(K33), _fp(w2c44),
            self.sdf_trunc, self.depth_max)
        if rc != 0:
            raise RuntimeError("tsdf integrate failed")

    def extract_mesh(self):
        lib = get_lib()
        grid = self.tsdf.copy()
        # unobserved voxels become NaN: marching skips cells touching them
        lib.i2sdf_tsdf_mask_unobserved(
            _fp(grid), _fp(self.weight), grid.size, np.float32(np.nan))
        grid = grid.reshape(self.dims)
        return marching_cubes(grid, 0.0, origin=self.origin,
                              spacing=(self.voxel_size,) * 3)


def exr_read(path: str):
    """Read a scanline EXR (NONE/ZIP/ZIPS, HALF/FLOAT/UINT).

    Returns (data, names): data float32 (H, W) for single-channel files
    or (H, W, C) in canonical order — RGB(A) when the file has R/G/B
    channels, else the file's (alphabetical) channel order; names is the
    matching list of channel names. Replaces the reference's cv2 EXR
    loads (`/root/reference/utils/rend_util.py:25-54`).
    """
    lib = get_lib()
    data_p = ctypes.POINTER(ctypes.c_float)()
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    c = ctypes.c_int32()
    names_buf = ctypes.create_string_buffer(256)
    rc = lib.i2sdf_exr_read(path.encode(), ctypes.byref(data_p),
                            ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c), names_buf)
    if rc != 0:
        raise IOError(f"EXR read failed (rc={rc}): {path}")
    try:
        data = np.ctypeslib.as_array(
            data_p, (h.value, w.value, c.value)).copy()
    finally:
        lib.i2sdf_free(data_p)
    names = names_buf.value.decode().split(";")
    canonical = ["R", "G", "B", "A"]
    if set(names) <= set(canonical) and len(names) > 1:
        order = sorted(range(len(names)),
                       key=lambda i: canonical.index(names[i]))
        data = data[:, :, order]
        names = [names[i] for i in order]
    if c.value == 1:
        return data[:, :, 0], names
    return data, names


def exr_write(path: str, data, names=None, half: bool = True,
              compression: str = "zip") -> None:
    """Write float32 (H, W) or (H, W, C) data as a scanline EXR."""
    lib = get_lib()
    data = _as_f32(data)
    if data.ndim == 2:
        data = data[:, :, None]
    h, w, c = data.shape
    if names is None:
        names = (["Y"] if c == 1 else ["R", "G", "B", "A"][:c]
                 if c <= 4 else [f"C{i}" for i in range(c)])
    comp = {"none": 0, "zip": 3}[compression]
    rc = lib.i2sdf_exr_write(path.encode(), _fp(data), h, w, c,
                             ";".join(names).encode(), int(half), comp)
    if rc != 0:
        raise IOError(f"EXR write failed (rc={rc}): {path}")


def rasterize_depth(verts, tris, K, w2c, h: int, w: int) -> np.ndarray:
    """Z-buffer depth render of a mesh from an OpenCV-convention camera."""
    lib = get_lib()
    verts = _as_f32(verts).reshape(-1, 3)
    tris = _as_i32(tris).reshape(-1, 3)
    K33 = _as_f32(np.asarray(K)[:3, :3])
    w2c44 = _as_f32(np.asarray(w2c)[:4, :4])
    out = np.empty((h, w), np.float32)
    rc = lib.i2sdf_rasterize_depth(
        _fp(verts), verts.shape[0], _ip(tris), tris.shape[0],
        _fp(K33), _fp(w2c44), h, w, _fp(out))
    if rc != 0:
        raise RuntimeError("rasterize failed")
    return out
