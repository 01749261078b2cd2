"""ctypes bindings for the native C++ data-prep/runtime kernels.

``available()`` reports whether the shared library could be built/loaded;
every binding has a pure-numpy fallback in :mod:`zdcsim.data.prep`, so the
framework degrades gracefully on toolchain-less machines. See
``src/prep_kernels.cpp`` for the rationale (SURVEY.md §2.7: the reference's
native layer is torch's prebuilt C++; these are zdcsim's equivalents for the
host-side pipeline).
"""

from __future__ import annotations

import ctypes
import logging
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        from zdcsim.native.build import build

        path = build()
        lib = ctypes.CDLL(path)
    except (RuntimeError, OSError) as e:
        log.warning("zdcsim native kernels unavailable (%s); using numpy fallbacks", e)
        return None
    i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.zdc_photon_sums.argtypes = [f32p, i64, i64, f32p]
    lib.zdc_max_coords.argtypes = [f32p, i64, i64, i64, f32p]
    lib.zdc_log1p.argtypes = [f32p, i64]
    lib.zdc_group_pixel_std.argtypes = [f32p, i64, i64p, i64p, i64, f32p]
    lib.zdc_gather_rows.argtypes = [f32p, i64, i64p, i64, f32p]
    lib.zdc_native_abi_version.restype = ctypes.c_int
    assert lib.zdc_native_abi_version() == 1
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def photon_sums(images: np.ndarray) -> np.ndarray:
    """[N, H, W] float32 -> [N] per-event pixel sums."""
    lib = _load()
    images = np.ascontiguousarray(images, np.float32)
    n = images.shape[0]
    pixels = int(np.prod(images.shape[1:]))
    if lib is None:
        return images.reshape(n, pixels).sum(axis=1)
    out = np.empty(n, np.float32)
    lib.zdc_photon_sums(_fptr(images), n, pixels, _fptr(out))
    return out


def max_coords(images: np.ndarray) -> np.ndarray:
    """[N, H, W] float32 -> [N, 2] argmax (row, col)."""
    lib = _load()
    images = np.ascontiguousarray(images, np.float32)
    n, h, w = images.shape
    if lib is None:
        flat = images.reshape(n, h * w).argmax(axis=1)
        return np.stack([flat // w, flat % w], axis=1).astype(np.float32)
    out = np.empty((n, 2), np.float32)
    lib.zdc_max_coords(_fptr(images), n, h, w, _fptr(out))
    return out


def log1p_(images: np.ndarray) -> np.ndarray:
    """In-place log1p on a contiguous float32 array; returns it."""
    lib = _load()
    if lib is None or not images.flags.c_contiguous or images.dtype != np.float32:
        return np.log1p(images, dtype=np.float32)
    lib.zdc_log1p(_fptr(images), images.size)
    return images


def group_pixel_std(images: np.ndarray, group_ids: np.ndarray) -> np.ndarray:
    """Unnormalized SDI-GAN diversity target (see prep_kernels.cpp)."""
    lib = _load()
    images = np.ascontiguousarray(images, np.float32)
    n = images.shape[0]
    pixels = int(np.prod(images.shape[1:]))
    order = np.argsort(group_ids, kind="stable").astype(np.int64)
    sorted_ids = np.asarray(group_ids)[order]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    group_start = np.concatenate([[0], boundaries, [n]]).astype(np.int64)
    n_groups = group_start.shape[0] - 1
    if lib is None:
        out = np.zeros(n, np.float64)
        flat = images.reshape(n, pixels).astype(np.float64)
        for g in range(n_groups):
            seg = order[group_start[g] : group_start[g + 1]]
            if seg.size > 1:
                out[seg] = flat[seg].std(axis=0).sum()
        return out.astype(np.float32)
    out = np.empty(n, np.float32)
    lib.zdc_group_pixel_std(
        _fptr(images), pixels, _iptr(order), _iptr(group_start), n_groups, _fptr(out)
    )
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Batch gather src[idx] with the native threaded memcpy."""
    lib = _load()
    src2 = np.ascontiguousarray(src.reshape(src.shape[0], -1), np.float32)
    idx = np.ascontiguousarray(idx, np.int64)
    if lib is None:
        return src[idx]
    out = np.empty((idx.shape[0], src2.shape[1]), np.float32)
    lib.zdc_gather_rows(_fptr(src2), src2.shape[1], _iptr(idx), idx.shape[0], _fptr(out))
    return out.reshape((idx.shape[0],) + src.shape[1:])
