"""ctypes bridge to the native C++ host-data library (native/msstpu_host.so).

The reference's input pipeline was pure-Python OpenCV and was the training
bottleneck (SURVEY.md §7). The hot host ops — resize, LUT mapping, batch
normalization/packing — are implemented in C++ with OpenMP in
``native/host_ops.cc``. Build with ``make -C modular_semantic_segmentation_tpu/native``.

Every entry point degrades gracefully: if the library is missing or the
input layout unsupported, return None and the caller falls back to
cv2/NumPy.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(os.path.dirname(__file__), "..", "native",
                           "msstpu_host.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(so_path))
    except OSError:
        _LIB = None
        return None
    lib.resize_bilinear_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_double]
    lib.resize_nearest.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_double, ctypes.c_double]
    lib.apply_lut_u8.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_void_p, ctypes.c_void_p]
    lib.pack_normalize_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_longlong, ctypes.c_float, ctypes.c_float,
        ctypes.c_void_p]
    _LIB = lib
    return lib


def available():
    return _load() is not None


def resize(img, fx, fy, interpolation):
    """Native resize; returns None when unsupported (caller falls back)."""
    import cv2
    lib = _load()
    if lib is None or img.ndim not in (2, 3):
        return None
    h, w = img.shape[:2]
    out_h, out_w = int(round(h * fy)), int(round(w * fx))
    if out_h < 1 or out_w < 1:
        return None
    c = img.shape[2] if img.ndim == 3 else 1
    # cv2 keeps the sampling scale at 1/f when called with fx/fy (it only
    # re-derives src/dst when dsize is passed), and computes coordinates in
    # DOUBLE — float scales flip floor() near integer boundaries (caught by
    # the parity tests)
    scale_y, scale_x = 1.0 / fy, 1.0 / fx
    if interpolation == cv2.INTER_LINEAR and img.dtype == np.uint8:
        src = np.ascontiguousarray(img)
        dst = np.empty((out_h, out_w) + img.shape[2:], np.uint8)
        lib.resize_bilinear_u8(src.ctypes.data, h, w, c,
                               dst.ctypes.data, out_h, out_w,
                               scale_y, scale_x)
        return dst
    if interpolation == cv2.INTER_NEAREST and img.dtype.itemsize in (1, 2, 4):
        src = np.ascontiguousarray(img)
        dst = np.empty((out_h, out_w) + img.shape[2:], img.dtype)
        lib.resize_nearest(src.ctypes.data, h, w, c, img.dtype.itemsize,
                           dst.ctypes.data, out_h, out_w, scale_y, scale_x)
        return dst
    return None


def apply_lut(img, lut):
    lib = _load()
    if lib is None or img.dtype != np.uint8:
        return None
    src = np.ascontiguousarray(img)
    dst = np.empty_like(src)
    lut = np.ascontiguousarray(lut, np.uint8)
    lib.apply_lut_u8(src.ctypes.data, src.size, lut.ctypes.data,
                     dst.ctypes.data)
    return dst


def pack_normalize(img_u8, scale=1.0 / 255.0, offset=0.0):
    """uint8 image -> float32, fused scale+offset, multithreaded."""
    lib = _load()
    if lib is None or img_u8.dtype != np.uint8:
        return None
    src = np.ascontiguousarray(img_u8)
    dst = np.empty(src.shape, np.float32)
    lib.pack_normalize_f32(src.ctypes.data, src.size, scale, offset,
                           dst.ctypes.data)
    return dst


def pack_normalize_into(src_u8, dst_f32, scale=1.0, offset=0.0):
    """Fused uint8 -> float32 conversion INTO a preallocated buffer (a batch
    slice), so batch assembly never allocates per-image temporaries.

    Returns False when the native library is missing or the views are not
    C-contiguous (caller falls back to NumPy).
    """
    lib = _load()
    if (lib is None or src_u8.dtype != np.uint8
            or dst_f32.dtype != np.float32
            or not src_u8.flags.c_contiguous
            or not dst_f32.flags.c_contiguous
            or src_u8.size != dst_f32.size):
        return False
    lib.pack_normalize_f32(src_u8.ctypes.data, src_u8.size, scale, offset,
                           dst_f32.ctypes.data)
    return True
