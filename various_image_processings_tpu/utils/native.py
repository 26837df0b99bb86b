"""ctypes loader for the native host runtime (native/libvip_native.so).

Builds on demand with make if the shared object is missing; every entry
point has a pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libvip_native.so"))


def _stale() -> bool:
    """True when any build input (sources, headers, Makefile — compiler
    flags count as arithmetic-relevant) is newer than the built .so."""
    import glob
    inputs = glob.glob(os.path.join(_NATIVE_DIR, "src", "*"))
    inputs.append(os.path.join(_NATIVE_DIR, "Makefile"))
    try:
        so_mtime = os.path.getmtime(_SO_PATH)
    except OSError:
        return False
    newest = 0.0
    for p in inputs:
        try:
            newest = max(newest, os.path.getmtime(p))
        except OSError:
            pass
    return newest > so_mtime


@functools.cache
def _lib():
    if not os.path.exists(_SO_PATH) or _stale():
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR), "-B"],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            # never load a stale .so: its arithmetic may predate the current
            # source, silently breaking native/fallback parity — fall back
            # to the pure-Python paths instead
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None
    # a stale build (older sources but newer mtime, e.g. a restored build
    # dir) can lack any of the newer entry points — verify every symbol
    # before assigning signatures, or the AttributeError below would break
    # all native paths instead of falling back to Python
    for sym in ("vip_ccl_4conn", "vip_trace_contour", "vip_component_sums",
                "vip_bgr2lab_u8", "vip_slic_merge", "vip_slic_connectivity"):
        if not hasattr(lib, sym):
            return None
    lib.vip_ccl_4conn.restype = ctypes.c_int
    lib.vip_ccl_4conn.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32)]
    lib.vip_trace_contour.restype = ctypes.c_int
    lib.vip_trace_contour.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64]
    lib.vip_component_sums.restype = None
    lib.vip_component_sums.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int64)]
    lib.vip_bgr2lab_u8.restype = None
    lib.vip_bgr2lab_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8)]
    lib.vip_slic_merge.restype = None
    lib.vip_slic_merge.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    lib.vip_slic_connectivity.restype = ctypes.c_int
    lib.vip_slic_connectivity.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32)]
    return lib


def available() -> bool:
    return _lib() is not None


def ccl_4conn(labels: np.ndarray):
    """(H, W) int32 → ((H, W) int32 components in raster first-encounter
    order, ncomp); None if the native lib is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    h, w = labels.shape
    comp = np.empty_like(labels)
    ncomp = lib.vip_ccl_4conn(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return comp, int(ncomp)


def trace_contour(mask: np.ndarray, start_x: int, start_y: int):
    """(H, W) u8 mask → list[(x, y)] contour, or None if unavailable.
    Raises RuntimeError on a non-closing trace (like the Python twin)."""
    lib = _lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.uint8)
    h, w = mask.shape
    max_len = h * w + 1
    out = np.empty(2 * max_len, np.int32)
    n = lib.vip_trace_contour(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(start_x), int(start_y),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len)
    if n < 0:
        raise RuntimeError("contour did not converge")
    return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)]


def component_sums(comp: np.ndarray, img: np.ndarray, ncomp: int):
    """Per-component (x, y, c0, c1, c2, count) int64 sums, or None."""
    lib = _lib()
    if lib is None:
        return None
    comp = np.ascontiguousarray(comp, np.int32)
    img = np.ascontiguousarray(img, np.uint8)
    h, w = comp.shape
    sums = np.empty((ncomp, 6), np.int64)
    lib.vip_component_sums(
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, ncomp,
        sums.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return sums


def bgr2lab_u8(img: np.ndarray, gamma_tab: np.ndarray, cbrt_tab: np.ndarray,
               coeffs: np.ndarray):
    """(..., 3) u8 BGR → (..., 3) u8 Lab via the native exact loop, or None.
    Tables come from core/colors.py:_lab_tables (int32)."""
    lib = _lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    gamma_tab = np.ascontiguousarray(gamma_tab, np.int32)
    cbrt_tab = np.ascontiguousarray(cbrt_tab, np.int32)
    coeffs = np.ascontiguousarray(coeffs, np.int32)
    out = np.empty_like(img)
    lib.vip_bgr2lab_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.size // 3,
        gamma_tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cbrt_tab.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def slic_connectivity(labels: np.ndarray, lab: np.ndarray, min_area: int):
    """Fused SLIC enforce_connectivity (euclidean metric): (H,W) i32 raw
    k-means labels + (H,W,3) u8 Lab image → (H,W) i32 final region labels
    in raster first-encounter order, or None if unavailable.  One native
    call replacing ccl_4conn + component_sums + slic_merge + the Python
    compaction (equality pinned by tests/test_native.py)."""
    lib = _lib()
    if lib is None or not hasattr(lib, "vip_slic_connectivity"):
        return None
    labels = np.ascontiguousarray(labels, np.int32)
    lab = np.ascontiguousarray(lab, np.uint8)
    h, w = labels.shape
    out = np.empty_like(labels)
    n = lib.vip_slic_connectivity(
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        int(min_area),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n < 0:
        return None
    return out


def slic_merge(comp: np.ndarray, means: np.ndarray, sizes: np.ndarray,
               min_area: int):
    """(H,W) i32 components + (N,3) i64 means + (N,) i64 sizes →
    (N,) i32 merged-root mapping (euclidean metric), or None."""
    lib = _lib()
    if lib is None:
        return None
    comp = np.ascontiguousarray(comp, np.int32)
    means = np.ascontiguousarray(means, np.int64)
    sizes = np.ascontiguousarray(sizes, np.int64)
    h, w = comp.shape
    n = means.shape[0]
    mapping = np.empty(n, np.int32)
    lib.vip_slic_merge(
        comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w, n,
        means.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(min_area),
        mapping.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return mapping
