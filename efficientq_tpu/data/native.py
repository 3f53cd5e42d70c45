"""ctypes bindings for the native host-side runtime (native/effq_native.cpp),
with transparent NumPy fallbacks.

Auto-builds the shared library with g++ on first use (cached); every entry
point degrades to an equivalent NumPy implementation when the toolchain or
library is unavailable, so the framework stays pure-Python-capable.
"""
from __future__ import annotations

import ctypes
import os
import os.path as P
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = P.join(P.dirname(P.dirname(P.dirname(P.abspath(__file__)))),
                     "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB if _LIB is not False else None
    with _LOCK:
        if _LIB is not None:
            return _LIB if _LIB is not False else None
        so = P.join(_NATIVE_DIR, "libeffq_native.so")
        try:
            if not P.isfile(so):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(so)
            lib.sample_value_voxel.restype = ctypes.c_int64
            lib.sample_value_voxel.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint8,
                ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)]
            lib.sample_not_value_voxel.restype = ctypes.c_int64
            lib.sample_not_value_voxel.argtypes = lib.sample_value_voxel.argtypes
            lib.count_value.restype = ctypes.c_int64
            lib.count_value.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                        ctypes.c_uint8]
            lib.zoom3d_linear.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64]
            lib.zoom3d_nearest_u8.argtypes = lib.zoom3d_linear.argtypes
            lib.s2d_bf16.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64]
            lib.s2d_patches_bf16.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
            _LIB = lib
        except Exception:
            _LIB = False
            return None
    return _LIB


def available() -> bool:
    return _load() is not None


def sample_mask_voxel(mask: np.ndarray, positive: bool,
                      seed: int) -> Tuple[int, Optional[Tuple[int, ...]]]:
    """Reservoir-sample a voxel where mask!=0 (positive) or mask==0.

    Returns (count, index_tuple or None).  mask: bool/uint8 array.
    """
    m = np.ascontiguousarray(mask.astype(np.uint8, copy=False))
    lib = _load()
    if lib is not None:
        out = ctypes.c_int64(-1)
        fn = lib.sample_not_value_voxel if positive else lib.sample_value_voxel
        # positive: mask != 0; negative: mask == 0
        count = fn(m.ctypes.data_as(ctypes.c_void_p), m.size,
                   ctypes.c_uint8(0), ctypes.c_uint64(seed or 1),
                   ctypes.byref(out))
        if count == 0:
            return 0, None
        return int(count), tuple(int(v) for v in
                                 np.unravel_index(out.value, m.shape))
    # fallback
    locs = np.argwhere(m != 0 if positive else m == 0)
    if len(locs) == 0:
        return 0, None
    rng = np.random.default_rng(seed)
    return len(locs), tuple(int(v) for v in locs[rng.integers(0, len(locs))])


def zoom3d(src: np.ndarray, out_shape: Tuple[int, int, int],
           order: int) -> np.ndarray:
    """Resample a 3-D volume to ``out_shape`` (order 0 = nearest for labels,
    order 1 = trilinear). Native when possible, scipy otherwise."""
    lib = _load()
    dd, dh, dw = out_shape
    if lib is not None and order == 1 and src.dtype == np.float32:
        s = np.ascontiguousarray(src)
        dst = np.empty(out_shape, np.float32)
        lib.zoom3d_linear(s.ctypes.data_as(ctypes.c_void_p), *s.shape,
                          dst.ctypes.data_as(ctypes.c_void_p), dd, dh, dw)
        return dst
    if lib is not None and order == 0 and src.dtype == np.uint8:
        s = np.ascontiguousarray(src)
        dst = np.empty(out_shape, np.uint8)
        lib.zoom3d_nearest_u8(s.ctypes.data_as(ctypes.c_void_p), *s.shape,
                              dst.ctypes.data_as(ctypes.c_void_p), dd, dh, dw)
        return dst
    from scipy import ndimage

    factors = [o / s for o, s in zip(out_shape, src.shape)]
    out = ndimage.zoom(src, factors, order=order)
    # zoom can be off-by-one on the output shape; pad/trim to exact
    pads = [(0, max(0, t - c)) for t, c in zip(out_shape, out.shape)]
    out = np.pad(out, pads)[:dd, :dh, :dw]
    return out


def s2d_bf16(vol: np.ndarray, min_planes: int = 0) -> np.ndarray:
    """Host-side space-to-depth serving transform (the prep for the fused
    s2d stem kernel, pallas/stem.py): (N, D, H, W, C) float32 ->
    (N, out_planes, H/2, W/2, 8C) bfloat16, D zero-padded to even (and to
    ``min_planes`` — odd-z-start patches read one plane past ceil(D/2)).

    Bit-identical to ``pallas.stem.s2d_volume`` + bf16 cast (RTNE), but as
    a threaded host memory shuffle instead of a 14.9 ms device relayout —
    it overlaps the previous volume's device compute in the pipelined
    serving loop.  Native when the toolchain is available, NumPy+ml_dtypes
    otherwise."""
    import ml_dtypes

    n, d, h, w, c = vol.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out_planes = max(-(-d // 2), int(min_planes))
    lib = _load()
    if lib is not None and vol.dtype == np.float32:
        src = np.ascontiguousarray(vol)
        dst = np.empty((n, out_planes, h // 2, w // 2, 8 * c), np.uint16)
        lib.s2d_bf16(src.ctypes.data_as(ctypes.c_void_p), n, d, h, w, c,
                     dst.ctypes.data_as(ctypes.c_void_p), out_planes)
        return dst.view(ml_dtypes.bfloat16)
    dp = 2 * out_planes
    if dp != d:
        vol = np.pad(vol, ((0, 0), (0, dp - d), (0, 0), (0, 0), (0, 0)))
    x = vol.reshape(n, dp // 2, 2, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return np.ascontiguousarray(
        x.reshape(n, dp // 2, h // 2, w // 2, 8 * c)).astype(
        ml_dtypes.bfloat16)


def s2d_patches_bf16(vol: np.ndarray, starts, patch_size) -> np.ndarray:
    """Fused s2d + patch-grid extraction (the stem kernel's exact input):
    (N, D, H, W, C) float32 -> (P*N, pd/2+1, ph/2, pw/2, 8C) bfloat16,
    P-major, bit-identical to extract_s2d_patches
    (pallas/stem.py::_slice_s2d on the device transform) — but the device
    then runs ZERO extraction work: the on-device stack build cost
    ~2.1 ms/volume in layout traffic (plane-minor DUS assembly + the
    relayout copy the Pallas stem operand forces).

    Plane 0 of even-z-start patches is the conv's patch-local zero pad;
    odd-start patches start one plane early in real data and mask
    in-kernel (see pallas/stem.py)."""
    import ml_dtypes

    n, d, h, w, c = vol.shape
    pd, ph, pw = patch_size
    p = len(starts)
    assert ph % 2 == 0 and pw % 2 == 0 and pd % 2 == 0, (pd, ph, pw)
    lib = _load()
    if lib is not None and vol.dtype == np.float32:
        src = np.ascontiguousarray(vol)
        st = np.ascontiguousarray(
            np.asarray(starts, np.int64).reshape(p, 3))
        dst = np.empty((p * n, pd // 2 + 1, ph // 2, pw // 2, 8 * c),
                       np.uint16)
        lib.s2d_patches_bf16(
            src.ctypes.data_as(ctypes.c_void_p), n, d, h, w, c,
            st.ctypes.data_as(ctypes.c_void_p), p, pd, ph, pw,
            dst.ctypes.data_as(ctypes.c_void_p))
        return dst.view(ml_dtypes.bfloat16)
    # NumPy fallback: s2d the whole volume, then slice per patch exactly
    # like pallas/stem.py::_slice_s2d
    need = max(((i - 1) // 2 + pd // 2 + 1) for (i, _, _) in starts)
    svol = s2d_bf16(vol, need)
    zero = np.zeros((n, 1, ph // 2, pw // 2, svol.shape[-1]), svol.dtype)
    pieces = []
    for (i, j, k) in starts:
        js, ks = j // 2, k // 2
        if i % 2 == 0:
            body = svol[:, i // 2:i // 2 + pd // 2,
                        js:js + ph // 2, ks:ks + pw // 2]
            pieces.append(np.concatenate([zero, body], axis=1))
        else:
            pieces.append(svol[:, (i - 1) // 2:(i - 1) // 2 + pd // 2 + 1,
                          js:js + ph // 2, ks:ks + pw // 2])
    stack = np.stack(pieces)
    return np.ascontiguousarray(stack.reshape(-1, *stack.shape[2:]))
