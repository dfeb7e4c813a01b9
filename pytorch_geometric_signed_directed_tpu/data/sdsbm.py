"""Signed directed stochastic block model generator.

Reference: data/general/SDSBM.py:10-68 — DSBM on |F|, blocks negated where
F < 0, then an eta fraction of edge signs flipped.
"""
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .dsbm import _dsbm_core


def SDSBM(N: int, K: int, p: float, F: np.ndarray, size_ratio: float = 1,
          eta: float = 0.1, rng: Optional[np.random.Generator] = None
          ) -> Tuple[sp.spmatrix, np.ndarray]:
    rng = rng or np.random.default_rng()
    A, assign = _dsbm_core(N, K, p, np.asarray(F, dtype=float), size_ratio,
                           rng)
    A = A.tocsr()
    if len(A.data):
        flip = rng.choice(len(A.data), size=int(len(A.data) * eta),
                          replace=False)
        A.data[flip] *= -1
    return A, assign
