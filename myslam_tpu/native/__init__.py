"""Native (C++) host-side runtime components, loaded via ctypes.

The library is compiled on first use with the system g++ into the
package directory (cached by source mtime).  Every entry point has a
numpy fallback, so the framework works without a toolchain; the native
path just removes full-frame temporaries from the prefetch thread's
critical section.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "packetenc.cc")
_LIB = os.path.join(_DIR, "libpacketenc.so")

_lib = None
_tried = False


def _build() -> str | None:
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB + ".tmp",
                   _SRC]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(_LIB + ".tmp", _LIB)
        return _LIB
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = _build()
        if path is not None:
            try:
                lib = ctypes.CDLL(path)
                u8p = ctypes.POINTER(ctypes.c_uint8)
                u16p = ctypes.POINTER(ctypes.c_uint16)
                f32p = ctypes.POINTER(ctypes.c_float)
                i64 = ctypes.c_int64
                lib.encode_color_u8.argtypes = [f32p, i64, u8p]
                lib.quantize_depth_u16.argtypes = [f32p, i64,
                                                   ctypes.c_float, u16p]
                lib.quantize_depth_u16.restype = ctypes.c_float
                lib.depth_max.argtypes = [f32p, i64]
                lib.depth_max.restype = ctypes.c_float
                lib.gather_pixels.argtypes = [
                    f32p, f32p, ctypes.c_int, ctypes.c_int, u16p, u16p,
                    i64, u8p, f32p, ctypes.POINTER(ctypes.c_int)]
                lib.has_nonpositive.argtypes = [f32p, i64]
                lib.has_nonpositive.restype = ctypes.c_int
                cf = ctypes.c_float
                ci = ctypes.c_int
                i32p = ctypes.POINTER(ctypes.c_int32)
                lib.render_analytic_frame.argtypes = [
                    f32p, ci, ci, cf, cf, cf, cf, f32p, f32p, ci,
                    f32p, f32p]
                lib.render_analytic_px.argtypes = [
                    f32p, i32p, i32p, i64, cf, cf, cf, cf, f32p, f32p,
                    ci, f32p, f32p]
                _lib = lib
            except OSError:
                _lib = None
    return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def encode_color_u8(color: np.ndarray) -> np.ndarray:
    """float32 [0,1] (any shape, last dim contiguous) -> uint8, rounded."""
    lib = get_lib()
    color = np.ascontiguousarray(color, np.float32)
    if lib is None:
        return np.clip(np.rint(color * 255.0), 0, 255).astype(np.uint8)
    out = np.empty(color.shape, np.uint8)
    lib.encode_color_u8(_ptr(color, ctypes.c_float), color.size,
                        _ptr(out, ctypes.c_uint8))
    return out


def quantize_depth_u16(depth: np.ndarray, q: float) -> np.ndarray:
    """float32 meters -> uint16 at scale q; valid depths never map to 0."""
    lib = get_lib()
    depth = np.ascontiguousarray(depth, np.float32)
    if lib is None:
        return np.where(
            depth > 0, np.clip(np.rint(depth * q), 1, 65535), 0
        ).astype(np.uint16)
    out = np.empty(depth.shape, np.uint16)
    lib.quantize_depth_u16(_ptr(depth, ctypes.c_float), depth.size,
                           ctypes.c_float(q), _ptr(out, ctypes.c_uint16))
    return out


def depth_max(depth: np.ndarray) -> float:
    lib = get_lib()
    depth = np.ascontiguousarray(depth, np.float32)
    if lib is None:
        return float(depth.max()) if depth.size else 0.0
    return float(lib.depth_max(_ptr(depth, ctypes.c_float), depth.size))


def gather_pixels(color: np.ndarray, depth: np.ndarray,
                  i: np.ndarray, j: np.ndarray):
    """Fused pixel-batch gather.

    color (H,W,3) f32, depth (H,W) f32, i/j uint16 flat index arrays.
    Returns (color u8 (m,3), depth f32 (m,), has_depthless bool).
    """
    lib = get_lib()
    if lib is None:
        jc, ic = j.astype(np.int64), i.astype(np.int64)
        px_color = np.clip(
            np.rint(color[jc, ic] * 255.0), 0, 255).astype(np.uint8)
        px_depth = depth[jc, ic].astype(np.float32)
        return px_color, px_depth, bool((depth <= 0).any())
    color = np.ascontiguousarray(color, np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    i = np.ascontiguousarray(i.reshape(-1), np.uint16)
    j = np.ascontiguousarray(j.reshape(-1), np.uint16)
    m = i.size
    out_c = np.empty((m, 3), np.uint8)
    out_d = np.empty((m,), np.float32)
    hd = ctypes.c_int(0)
    H, W = depth.shape
    lib.gather_pixels(
        _ptr(color, ctypes.c_float), _ptr(depth, ctypes.c_float), H, W,
        _ptr(i, ctypes.c_uint16), _ptr(j, ctypes.c_uint16), m,
        _ptr(out_c, ctypes.c_uint8), _ptr(out_d, ctypes.c_float),
        ctypes.byref(hd))
    # has_depthless must reflect the WHOLE frame, not just sampled pixels
    whole = bool(lib.has_nonpositive(_ptr(depth, ctypes.c_float),
                                     depth.size))
    return out_c, out_d, whole


def render_analytic_frame(c2w, H, W, fx, fy, cx, cy, room, spheres):
    """Multithreaded full-frame raycast of the procedural scene, or None
    when the native library is unavailable (caller falls back to numpy)."""
    lib = get_lib()
    if lib is None:
        return None
    c2w = np.ascontiguousarray(c2w, np.float32)
    room = np.ascontiguousarray(room, np.float32)
    spheres = np.ascontiguousarray(spheres, np.float32)
    color = np.empty((H, W, 3), np.float32)
    depth = np.empty((H, W), np.float32)
    lib.render_analytic_frame(
        _ptr(c2w, ctypes.c_float), H, W, fx, fy, cx, cy,
        _ptr(room, ctypes.c_float), _ptr(spheres, ctypes.c_float),
        len(spheres), _ptr(color, ctypes.c_float),
        _ptr(depth, ctypes.c_float))
    return color, depth


def render_analytic_px(c2w, i, j, fx, fy, cx, cy, room, spheres):
    """Sparse raycast at pixel coords i/j (int arrays), or None."""
    lib = get_lib()
    if lib is None:
        return None
    c2w = np.ascontiguousarray(c2w, np.float32)
    room = np.ascontiguousarray(room, np.float32)
    spheres = np.ascontiguousarray(spheres, np.float32)
    i = np.ascontiguousarray(i, np.int32)
    j = np.ascontiguousarray(j, np.int32)
    m = i.size
    color = np.empty((m, 3), np.float32)
    depth = np.empty((m,), np.float32)
    lib.render_analytic_px(
        _ptr(c2w, ctypes.c_float), _ptr(i, ctypes.c_int32),
        _ptr(j, ctypes.c_int32), m, fx, fy, cx, cy,
        _ptr(room, ctypes.c_float), _ptr(spheres, ctypes.c_float),
        len(spheres), _ptr(color, ctypes.c_float),
        _ptr(depth, ctypes.c_float))
    return color, depth
