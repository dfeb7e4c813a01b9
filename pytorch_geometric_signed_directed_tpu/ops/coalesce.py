"""Shared host-side edge coalescing.

One implementation of the sort-by-(row, col) + reduce-duplicates pattern
(int64-safe linear keys) used by the COO builder, graph operators,
spectral symmetrization and feature builders.
"""
from typing import Optional, Tuple

import numpy as np


def coalesce_edges(row, col, *values, num_cols: int,
                   ) -> Tuple[np.ndarray, ...]:
    """Sort edges by (row, col) and sum duplicate entries of each value
    array.  Returns (row, col, *summed_values)."""
    row = np.asarray(row, np.int64).ravel()
    col = np.asarray(col, np.int64).ravel()
    key = row * np.int64(num_cols) + col
    uniq, inv = np.unique(key, return_inverse=True)
    out_vals = []
    for v in values:
        v = np.asarray(v)
        s = np.zeros(len(uniq), dtype=v.dtype if
                     np.issubdtype(v.dtype, np.floating) else np.float64)
        np.add.at(s, inv, v)
        out_vals.append(s)
    return (uniq // num_cols, uniq % num_cols, *out_vals)
