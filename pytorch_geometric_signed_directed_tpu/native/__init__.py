"""ctypes bindings for the native C++ data tier (csrc/pgsd_native.cpp).

Compiled on first use with g++ into a per-user cache; every entry point has
a pure-Python fallback, so the package works without a toolchain.
"""
import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_lib = None
_tried = False


def _csrc_path() -> str:
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(here, "csrc", "pgsd_native.cpp")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _csrc_path()
    if not os.path.isfile(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(tempfile.gettempdir(),
                         f"libpgsd_native_{digest}.so")
    if not os.path.isfile(cache):
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
                 "-o", cache], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        lib = ctypes.CDLL(cache)
    except OSError:
        return None
    lib.pgsd_parse_csv.restype = ctypes.c_void_p
    lib.pgsd_parse_csv.argtypes = [ctypes.c_char_p]
    lib.pgsd_num_edges.restype = ctypes.c_int64
    lib.pgsd_num_edges.argtypes = [ctypes.c_void_p]
    lib.pgsd_num_nodes.restype = ctypes.c_int64
    lib.pgsd_num_nodes.argtypes = [ctypes.c_void_p]
    lib.pgsd_fill.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
    ]
    lib.pgsd_free.argtypes = [ctypes.c_void_p]
    lib.pgsd_coalesce.restype = ctypes.c_int64
    lib.pgsd_coalesce.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.pgsd_argsort_u64.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.pgsd_coalesce_fused.restype = ctypes.c_int64
    lib.pgsd_coalesce_fused.argtypes = [
        np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
    ]
    lib.pgsd_magnetic_sym_lap.restype = ctypes.c_int64
    lib.pgsd_magnetic_sym_lap.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    lib.pgsd_plan_build.restype = ctypes.c_void_p
    lib.pgsd_plan_build.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_void_p,  # group int8* or None
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64,
    ]
    for f in ("pgsd_plan_total", "pgsd_plan_chunks",
              "pgsd_plan_hot_chunks"):
        getattr(lib, f).restype = ctypes.c_int64
        getattr(lib, f).argtypes = [ctypes.c_void_p]
    lib.pgsd_plan_fill.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    lib.pgsd_plan_free.argtypes = [ctypes.c_void_p]
    lib.pgsd_window_hist.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_void_p,  # grp int8* or None
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.pgsd_permute_gather.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.pgsd_symmetrize.restype = ctypes.c_int64
    lib.pgsd_symmetrize.argtypes = [
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def parse_signed_csv(path: str) -> Optional[
        Tuple[np.ndarray, np.ndarray, np.ndarray, int]]:
    """(rows, cols, weights, num_nodes) or None if the native lib is
    unavailable.  Node ids are assigned in first-seen order — identical to
    the reference's Python dict loop."""
    lib = _load()
    if lib is None:
        return None
    h = lib.pgsd_parse_csv(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        e = lib.pgsd_num_edges(h)
        n = lib.pgsd_num_nodes(h)
        rows = np.empty(e, np.int64)
        cols = np.empty(e, np.int64)
        w = np.empty(e, np.float32)
        lib.pgsd_fill(h, rows, cols, w)
    finally:
        lib.pgsd_free(h)
    return rows, cols, w, int(n)


def stable_argsort(keys: np.ndarray) -> np.ndarray:
    """Stable argsort of non-negative int keys.

    Wide keys (beyond 32 bits — the row*num_cols+col composite keys of
    WikiTalk-scale coalescing) route to the native LSD radix sort
    (~1.4x numpy's mergesort there, measured on this image); narrow keys
    stay on numpy, which wins below ~3 radix passes.
    """
    keys = np.asarray(keys)
    lib = _load()
    if (lib is None or keys.size < (1 << 20)
            or int(keys.max(initial=0)) < (1 << 32)):
        return np.argsort(keys, kind="stable")
    perm = np.empty(len(keys), np.int64)
    lib.pgsd_argsort_u64(np.ascontiguousarray(keys, np.uint64),
                         len(keys), perm)
    return perm


def coalesce_multi(keys: np.ndarray, *values) -> Optional[tuple]:
    """Sorted unique keys + per-run sums of each value array, in one
    native pass (threaded radix argsort + fused accumulate — the numpy
    pipeline walks the edge list 1 + 2*len(values) times).  Values are
    accumulated in float64.  Returns (unique_keys int64, *sums float64)
    or None if the native lib is unavailable."""
    lib = _load()
    if lib is None or len(keys) == 0:
        return None
    src = np.asarray(keys)
    # the native call rewrites keys in place; copy only when the caller's
    # array would otherwise be aliased (ascontiguousarray with a dtype
    # change already allocates)
    keys = np.ascontiguousarray(src, np.uint64)
    if keys is src or keys.base is src:
        keys = keys.copy()
    n = len(keys)
    vals = np.ascontiguousarray(
        np.stack([np.asarray(v, np.float64) for v in values])
        if values else np.zeros((0, n)))
    m = lib.pgsd_coalesce_fused(keys, vals, n, len(values))
    return (keys[:m].astype(np.int64),
            *(vals[v, :m] for v in range(len(values))))


def coalesce(rows: np.ndarray, cols: np.ndarray, weights: np.ndarray,
             num_cols: int) -> Optional[Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]]:
    """In-place sort-by-(row, col) + duplicate-sum; returns trimmed copies,
    or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int64).copy()
    cols = np.ascontiguousarray(cols, np.int64).copy()
    weights = np.ascontiguousarray(weights, np.float32).copy()
    out = lib.pgsd_coalesce(rows, cols, weights, len(rows), num_cols)
    return rows[:out], cols[:out], weights[:out]


def plan_layout(row: np.ndarray, num_rows: int, window: int, chunk: int,
                group: Optional[np.ndarray] = None) -> Optional[dict]:
    """Fused MXU scatter-plan layout (the whole of
    ops/pallas/scatter_mxu._build_plan_host after geometry selection):
    one stable radix argsort by the (group-major, window, local-row)
    composite key + one threaded bin-layout pass.  Bit-identical to the
    numpy pipeline (asserted in tests/test_native.py).  Returns the
    host-plan dict fields (perm, lr, gr, win, visited, hot_chunks) or
    None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    e = len(row)
    ngrp = 1 if group is None else 2
    gptr = None
    garr = None
    if group is not None:
        garr = np.ascontiguousarray(group, np.int8)
        gptr = garr.ctypes.data_as(ctypes.c_void_p)
    h = lib.pgsd_plan_build(row, gptr, e, int(num_rows), int(window),
                            int(chunk), ngrp)
    try:
        total = lib.pgsd_plan_total(h)
        nchunks = lib.pgsd_plan_chunks(h)
        hot = lib.pgsd_plan_hot_chunks(h)
        perm = np.empty(total, np.int64)
        lr = np.empty(total, np.int32)
        gr = np.empty(total, np.int32)
        win = np.empty(nchunks, np.int32)
        num_windows = (max(num_rows, 1) + window - 1) // window
        visited = np.empty(num_windows, np.uint8)
        lib.pgsd_plan_fill(h, perm, lr, gr, win, visited)
    finally:
        lib.pgsd_plan_free(h)
    return dict(perm=perm, lr=lr, gr=gr, win=win,
                visited=visited.astype(bool), window=window, chunk=chunk,
                num_windows=int(num_windows), num_edges=e,
                num_rows=num_rows, hot_chunks=int(hot))


def window_hist(row: np.ndarray, group: Optional[np.ndarray],
                nbins: int) -> Optional[np.ndarray]:
    """Threaded bincount of (row >> 7) * ngrp + grp (the finest-window
    degree histogram of _pick_geometry); None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    ngrp = 1 if group is None else 2
    gptr = None
    garr = None
    if group is not None:
        garr = np.ascontiguousarray(group, np.int8)
        gptr = garr.ctypes.data_as(ctypes.c_void_p)
    out = np.zeros(nbins, np.int64)
    lib.pgsd_window_hist(row, gptr, len(row), nbins, ngrp, out)
    return out


def permute_gather(perm: np.ndarray, src: np.ndarray
                   ) -> Optional[np.ndarray]:
    """out[i] = src[perm[i]] (perm -1 -> 0), threaded, for 4/8-byte
    1-D arrays; None if unavailable or unsupported dtype."""
    lib = _load()
    if lib is None or src.ndim != 1 or src.itemsize not in (4, 8):
        return None
    perm = np.ascontiguousarray(perm, np.int64)
    src = np.ascontiguousarray(src)
    out = np.empty(len(perm), src.dtype)
    lib.pgsd_permute_gather(
        perm, len(perm), src.ctypes.data_as(ctypes.c_char_p),
        out.ctypes.data_as(ctypes.c_char_p), src.itemsize)
    return out


def symmetrize(row: np.ndarray, col: np.ndarray, w: np.ndarray,
               num_nodes: int) -> Optional[Tuple[np.ndarray, np.ndarray,
                                                 np.ndarray, np.ndarray,
                                                 np.ndarray]]:
    """Fused magnetic symmetrization (spectral/magnetic._symmetrize's hot
    path): per unique (i, j), i != j, sorted by (i, j):

      sym   = sum of w over both directions   (caller halves)
      theta = sum of +w (forward) - w (reverse)
      abs   = sum of |w| over both directions (caller halves)

    Both-direction keys are built on the fly in C++ (self-loops skipped),
    so the 2E key/value concats of the numpy pipeline never materialize.
    Returns (row, col, sym, theta, abs) float64 or None if the native lib
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    w = np.ascontiguousarray(w, np.float64)
    e = len(row)
    out_row = np.empty(2 * e, np.int64)
    out_col = np.empty(2 * e, np.int64)
    out_sym = np.empty(2 * e, np.float64)
    out_theta = np.empty(2 * e, np.float64)
    out_abs = np.empty(2 * e, np.float64)
    m = lib.pgsd_symmetrize(row, col, w, e, int(num_nodes),
                            out_row, out_col, out_sym, out_theta, out_abs)
    return (out_row[:m], out_col[:m], out_sym[:m], out_theta[:m],
            out_abs[:m])


def magnetic_sym_lap(row: np.ndarray, col: np.ndarray, w: np.ndarray,
                     num_nodes: int, q: float, deg_mode: int
                     ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                         np.ndarray, np.ndarray]]:
    """Fused sym-normalized magnetic Laplacian host build (the whole of
    spectral/magnetic._laplacian_core for normalization="sym"):
    symmetrize + weighted degree + D^-1/2 A D^-1/2 + phase cos/sin, with
    the [sorted off-diagonal edges; N diagonal entries] output layout the
    -I merge expects.  deg_mode: 0 unsigned, 1 signed absolute_degree,
    2 signed plain-abs.  Returns (row, col, w_re, w_im) or None if the
    native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    w = np.ascontiguousarray(w, np.float64)
    e, n = len(row), int(num_nodes)
    cap = 2 * e + n
    out_row = np.empty(cap, np.int64)
    out_col = np.empty(cap, np.int64)
    out_wre = np.empty(cap, np.float64)
    out_wim = np.empty(cap, np.float64)
    m = lib.pgsd_magnetic_sym_lap(row, col, w, e, n, float(q),
                                  int(deg_mode), out_row, out_col,
                                  out_wre, out_wim)
    tot = m + n
    return out_row[:tot], out_col[:tot], out_wre[:tot], out_wim[:tot]
