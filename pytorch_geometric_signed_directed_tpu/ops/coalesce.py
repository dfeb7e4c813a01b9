"""Shared host-side edge coalescing.

One implementation of the sort-by-(row, col) + reduce-duplicates pattern
(int64-safe linear keys) used by the COO builder, graph operators,
spectral symmetrization and feature builders.
"""
from typing import Optional, Tuple

import numpy as np

# Below this many entries the numpy argsort+reduceat pipeline wins (the
# native path pays a [nv, n] float64 stack copy + ctypes crossing).
FUSED_COALESCE_MIN = 1 << 21


def coalesce_edges(row, col, *values, num_cols: int,
                   ) -> Tuple[np.ndarray, ...]:
    """Sort edges by (row, col) and sum duplicate entries of each value
    array.  Returns (row, col, *summed_values).

    One argsort + add.reduceat over contiguous duplicate runs — an order
    of magnitude faster than np.unique(return_inverse) + np.add.at at
    WikiTalk scale (~40M entries).  Giant inputs route to the fused
    native path (threaded radix sort + single accumulate pass,
    native.coalesce_multi) when the toolchain is available."""
    from ..native import coalesce_multi, stable_argsort

    row = np.asarray(row, np.int64).ravel()
    col = np.asarray(col, np.int64).ravel()
    key = row * np.int64(num_cols) + col
    if len(key) >= FUSED_COALESCE_MIN:
        fused = coalesce_multi(key, *values)
        if fused is not None:
            uniq, *sums = fused
            out_vals = []
            for v, s in zip(values, sums):
                dt = (np.asarray(v).dtype
                      if np.issubdtype(np.asarray(v).dtype, np.floating)
                      else np.float64)
                out_vals.append(s.astype(dt, copy=False))
            return (uniq // num_cols, uniq % num_cols, *out_vals)
    order = stable_argsort(key)
    ks = key[order]
    starts = np.concatenate(
        [[0], np.flatnonzero(np.diff(ks)) + 1]) if len(ks) else np.zeros(
            0, np.int64)
    uniq = ks[starts] if len(ks) else ks
    out_vals = []
    for v in values:
        v = np.asarray(v)
        dt = v.dtype if np.issubdtype(v.dtype, np.floating) else np.float64
        s = (np.add.reduceat(v[order].astype(dt), starts)
             if len(ks) else np.zeros(0, dt))
        out_vals.append(s)
    return (uniq // num_cols, uniq % num_cols, *out_vals)
