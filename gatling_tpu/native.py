"""ctypes bridge to the native host-geometry library (native/gatling_native.cpp).

The reference keeps its host-side mesh pipeline in C++ (meshoptimizer dedup,
MeshProcessing.cpp; synchronous device BLAS builds, CgpuVk.cpp); our analog
is a small C++ shared library for the operations that dominate scene-build
time at production scale: Morton ordering, threaded-BVH construction, vertex
deduplication. The library is compiled on demand with the system g++ and
falls back to the NumPy implementations transparently when unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from gatling_tpu.utils.log import get_logger

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "gatling_native.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libgatling_native.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build_library() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
             "-o", _LIB_PATH, _SRC, "-lz"],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:  # noqa: BLE001
        get_logger().debug("native build failed: %s", e)
        return False


def get_library() -> ctypes.CDLL | None:
    """Load (building if necessary) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)):
            if not os.path.exists(_SRC) or not _build_library():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.gatling_morton_order.argtypes = [f32p, f32p, ctypes.c_int64, i32p]
        lib.gatling_morton_order.restype = None
        lib.gatling_build_bvh.argtypes = [
            f32p, f32p, ctypes.c_int64, ctypes.c_int32,
            f32p, f32p, i32p, i32p, i32p, i32p, ctypes.c_int64]
        lib.gatling_build_bvh.restype = ctypes.c_int64
        lib.gatling_dedup.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i32p]
        lib.gatling_dedup.restype = ctypes.c_int64
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gatling_compress.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.gatling_compress.restype = ctypes.c_int64
        lib.gatling_decompress.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.gatling_decompress.restype = ctypes.c_int64
        lib.gatling_lz4_decompress.argtypes = [
            u8p, ctypes.c_int64, u8p, ctypes.c_int64]
        lib.gatling_lz4_decompress.restype = ctypes.c_int64
        _lib = lib
        get_logger().debug("loaded native library %s", _LIB_PATH)
        return _lib


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def native_build_bvh(tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int):
    """Returns (bbox_min, bbox_max, skip, leaf_start, leaf_count, order) or
    None when the native library is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    t = len(tri_min)
    tri_min = np.ascontiguousarray(tri_min, np.float32)
    tri_max = np.ascontiguousarray(tri_max, np.float32)
    max_nodes = 2 * t + 8
    bbox_min = np.empty((max_nodes, 3), np.float32)
    bbox_max = np.empty((max_nodes, 3), np.float32)
    skip = np.empty(max_nodes, np.int32)
    leaf_start = np.empty(max_nodes, np.int32)
    leaf_count = np.empty(max_nodes, np.int32)
    order = np.empty(t, np.int32)
    n = lib.gatling_build_bvh(
        _fp(tri_min), _fp(tri_max), t, leaf_size,
        _fp(bbox_min), _fp(bbox_max), _ip(skip), _ip(leaf_start),
        _ip(leaf_count), _ip(order), max_nodes)
    if n <= 0:
        return None
    return (bbox_min[:n], bbox_max[:n], skip[:n], leaf_start[:n],
            leaf_count[:n], order.astype(np.int64))


def native_dedup(rows: np.ndarray):
    """Row deduplication remap ([N] int32, unique_count) or None."""
    lib = get_library()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.float32)
    n, stride = rows.shape
    remap = np.empty(n, np.int32)
    unique = lib.gatling_dedup(_fp(rows), n, stride, _ip(remap))
    return remap, int(unique)


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_compress(raw: bytes | np.ndarray, elem_size: int) -> bytes | None:
    """Byteshuffle + deflate one buffer (giProcessMeshData analog,
    MeshProcessing.cpp:56-78). None when the native library is unavailable
    or compression would not fit the bound (callers keep the raw bytes)."""
    lib = get_library()
    if lib is None:
        return None
    src = np.frombuffer(bytes(raw), np.uint8) if not isinstance(raw, np.ndarray) else raw
    src = np.ascontiguousarray(src, np.uint8)
    cap = src.size + src.size // 8 + 256
    dst = np.empty(cap, np.uint8)
    csize = lib.gatling_compress(_u8p(src), src.size, elem_size, _u8p(dst), cap)
    if csize <= 0:
        return None
    return dst[:csize].tobytes()


def native_lz4_decompress(blob: bytes, max_out: int) -> bytes | None:
    """LZ4 block decode for the crate (.usdc) reader; None when the native
    library is unavailable or the block is malformed (callers fall back to
    the pure-python decoder, scene/crate.py lz4_decompress_block)."""
    lib = get_library()
    if lib is None or not blob:
        return None
    src = np.frombuffer(blob, np.uint8)
    dst = np.empty(max_out, np.uint8)
    got = lib.gatling_lz4_decompress(_u8p(src), src.size, _u8p(dst), max_out)
    if got < 0:
        return None
    return dst[:got].tobytes()


def native_decompress(blob: bytes, n: int, elem_size: int) -> np.ndarray | None:
    """Inverse of native_compress: returns [n] uint8 or None."""
    lib = get_library()
    if lib is None:
        return None
    src = np.frombuffer(blob, np.uint8)
    dst = np.empty(n, np.uint8)
    got = lib.gatling_decompress(_u8p(src), src.size, elem_size, _u8p(dst), n)
    if got != n:
        return None
    return dst
