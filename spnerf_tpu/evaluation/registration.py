"""DSM registration: multiscale NaN-aware NCC alignment of a predicted DSM to the
lidar ground truth, then an affine z-mapping.

Re-implements the algorithm of the reference's numba kernels
(/root/reference/modules/dsmr.py:7-213) with two interchangeable backends:

  * a vectorized numpy implementation (this file) — the pyramid downsample and the
    NCC search are expressed as array ops instead of pixel loops;
  * a C++ shared library (spnerf_tpu/native/dsmr.cpp, loaded via ctypes) that mirrors
    the same algorithm for speed parity with the reference's JIT-compiled kernels.
    `use_native=True` (default) uses it when the library is built, else falls back.

Algorithm (reference semantics):
  1. build a NaN-aware 2x average pyramid while min(h, w) > 100;
  2. coarse-to-fine: at each level search the (2*dx_prev +- irange) window for the
     integer shift maximizing NCC over finite overlapping pixels (irange=5);
  3. z-mapping: a = sig_ref/sig_sec if scaling else 1, b = mu_ref - a * mu_sec;
  4. apply: out[j, i] = a * v[j + dy, i + dx] + b (NaN outside).
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np

_NATIVE = None


def _try_build_native(lib_path):
    """Best-effort on-first-use build of libdsmr.so (one g++ command, ~1 s).

    Builds to a pid-suffixed temp file then os.replace()s it in so concurrent
    processes never dlopen a partially written library. Returns True if the
    library exists afterwards."""
    src = os.path.join(os.path.dirname(lib_path), "dsmr.cpp")
    if not os.path.exists(src) or shutil.which("g++") is None:
        return False
    tmp = f"{lib_path}.tmp{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             "-o", tmp, src],
            check=True, capture_output=True, timeout=300)
        os.replace(tmp, lib_path)
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        # another process may have won the race and produced the lib
        return os.path.exists(lib_path)
    return True


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    lib_path = os.path.join(os.path.dirname(__file__), "..", "native", "libdsmr.so")
    lib_path = os.path.abspath(lib_path)
    if not os.path.exists(lib_path) and not _try_build_native(lib_path):
        _NATIVE = False
        return False
    try:
        lib = ctypes.CDLL(lib_path)
        lib.dsmr_compute_shift.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ]
        lib.dsmr_apply_shift.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double,
        ]
    except (OSError, AttributeError):
        # a freshly built lib can still fail to dlopen (toolchain/ABI
        # mismatch, e.g. -march=native artifacts moved across hosts) or lack
        # the expected symbols; fall back to the numpy registration path
        # instead of crashing MAE evaluation
        _NATIVE = False
        return False
    _NATIVE = lib
    return lib


def downsample2x(u):
    """NaN-aware 2x downsample: mean of the finite values in each 2x2 block
    (reference dsmr.downsample2x, modules/dsmr.py:17-47). u: (H, W)."""
    h, w = u.shape
    ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
    pad = np.full((ph, pw), np.nan)
    pad[:h, :w] = u
    blocks = pad.reshape(ph // 2, 2, pw // 2, 2).transpose(0, 2, 1, 3)
    blocks = blocks.reshape(ph // 2, pw // 2, 4)
    cnt = np.isfinite(blocks).sum(axis=-1)
    s = np.nansum(blocks, axis=-1)
    with np.errstate(invalid="ignore"):
        out = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
    return out


def _shifted_view(v, dx, dy):
    """v sampled at (i+dx, j+dy), NaN-padded, same shape as v."""
    h, w = v.shape
    out = np.full((h, w), np.nan)
    src_y0, src_y1 = max(0, dy), min(h, h + dy)
    src_x0, src_x1 = max(0, dx), min(w, w + dx)
    dst_y0, dst_y1 = max(0, -dy), max(0, -dy) + (src_y1 - src_y0)
    dst_x0, dst_x1 = max(0, -dx), max(0, -dx) + (src_x1 - src_x0)
    if src_y1 > src_y0 and src_x1 > src_x0:
        out[dst_y0:dst_y1, dst_x0:dst_x1] = v[src_y0:src_y1, src_x0:src_x1]
    return out


def _moments(u, v, dx, dy):
    """(mu_u, mu_v, sig_u, sig_v, xcorr) over finite overlapping pixels of u and
    v shifted by (dx, dy) — reference mean_std (modules/dsmr.py:50-89)."""
    vv = _shifted_view(v, dx, dy)
    ok = np.isfinite(u) & np.isfinite(vv)
    n = ok.sum()
    if n == 0:
        return 0.0, 0.0, 0.0, 0.0, 0.0
    a = u[ok]
    b = vv[ok]
    muu, muv = a.mean(), b.mean()
    da, db = a - muu, b - muv
    return muu, muv, np.sqrt((da * da).mean()), np.sqrt((db * db).mean()), (da * db).mean()


def ncc(u, v, dx=0, dy=0):
    muu, muv, sigu, sigv, xc = _moments(u, v, dx, dy)
    return xc / (sigu * sigv) if sigu > 0 and sigv > 0 else -np.inf


def _search_ncc(u, v, irange, dx0, dy0):
    best = (-np.inf, dx0, dy0)
    for dy in range(dy0 - irange, dy0 + irange + 1):
        for dx in range(dx0 - irange, dx0 + irange + 1):
            c = ncc(u, v, dx, dy)
            if c > best[0]:
                best = (c, dx, dy)
    return best[1], best[2]


def _recursive_ncc(u, v, irange=5, dx=0, dy=0):
    if min(u.shape) > 100:
        dx, dy = _recursive_ncc(downsample2x(u), downsample2x(v), irange,
                                dx // 2, dy // 2)
        dx, dy = dx * 2, dy * 2
    return _search_ncc(u, v, irange, dx, dy)


def compute_shift(ref, sec, scaling=False, irange=5, use_native=True):
    """Shift (dx, dy) + affine (a, b) registering `sec` onto `ref`.

    ref, sec: (H, W) float arrays (NaN = nodata). Reference:
    dsmr.compute_shift (modules/dsmr.py:161-188), called with scaling=False by
    the eval pipeline (modules/utils.py:205).
    """
    ref = np.asarray(ref, np.float64)
    sec = np.asarray(sec, np.float64)
    lib = _load_native() if use_native else False
    if lib:
        dx = ctypes.c_int(0)
        dy = ctypes.c_int(0)
        a = ctypes.c_double(1.0)
        b = ctypes.c_double(0.0)
        r = np.ascontiguousarray(ref)
        s = np.ascontiguousarray(sec)
        lib.dsmr_compute_shift(
            r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ref.shape[0], ref.shape[1], irange, int(scaling),
            ctypes.byref(dx), ctypes.byref(dy), ctypes.byref(a), ctypes.byref(b),
        )
        return dx.value, dy.value, a.value, b.value

    dx, dy = _recursive_ncc(ref, sec, irange)
    muu, muv, sigu, sigv, _ = _moments(ref, sec, dx, dy)
    a = sigu / sigv if scaling and sigv > 0 else 1.0
    b = muu - muv * a
    return dx, dy, a, b


def apply_shift(v, dx=0, dy=0, a=1.0, b=0.0, use_native=True):
    """Resample v by the integer shift and apply z -> a*z + b
    (reference dsmr.apply_shift_, modules/dsmr.py:139-150).

    Documented deviation: the reference signature also takes planar-ramp
    terms c, d (z + c*x + d*y). They are intentionally dropped here — the
    reference's own numba kernel shadows `c` with its channel loop variable
    (modules/dsmr.py:146), so the ramp never takes effect, and every caller
    passes c=d=0 (modules/dsmr.py:207-213, eval.py:229-232). Reproducing the
    parameters would reproduce a latent bug, not behavior."""
    v = np.asarray(v, np.float64)
    lib = _load_native() if use_native else False
    if lib:
        src = np.ascontiguousarray(v)
        out = np.empty_like(src)
        lib.dsmr_apply_shift(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            v.shape[0], v.shape[1], int(dx), int(dy), float(a), float(b),
        )
        return out
    return a * _shifted_view(v, dx, dy) + b
