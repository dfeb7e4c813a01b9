"""Signed stochastic block model generator.

Reference: data/signed/SSBM.py:9-162.  Same sampling distribution
(per-pair Bernoulli edges with sign flips, geometric community sizes);
the reference's geometric-skip scan is replaced by vectorized
binomial-count + choice sampling per block pair.
"""
import math
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp


def fill(values: str = "ones", size: int = 1,
         rng: Optional[np.random.Generator] = None) -> np.ndarray:
    rng = rng or np.random.default_rng()
    if values == "ones":
        return np.ones(size)
    if values == "exp":
        return rng.exponential(size=size)
    if values == "uniform":
        return rng.uniform(size=size)
    raise ValueError(values)


def geometric_sizes(n: int, k: int, size_ratio: float):
    """Community sizes in geometric progression (reference :59-70)."""
    size = [0] * k
    if size_ratio > 1:
        ratio_each = np.power(size_ratio, 1 / (k - 1))
        size[0] = math.floor(n * (1 - ratio_each) / (1 - np.power(ratio_each, k)))
        for i in range(1, k - 1):
            size[i] = math.floor(size[i - 1] * ratio_each)
        size[k - 1] = n - int(np.sum(size[:k - 1]))
    else:
        size = [math.floor((i + 1) * n / k) - math.floor(i * n / k)
                for i in range(k)]
    return size


def _sample_pairs(u_nodes, v_nodes, p, rng, same_block: bool):
    """Sample Bernoulli(p) unordered pairs between two node sets."""
    nu, nv = len(u_nodes), len(v_nodes)
    if same_block:
        iu, iv = np.triu_indices(nu, k=1)
        m = len(iu)
    else:
        m = nu * nv
    if m == 0 or p <= 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    cnt = rng.binomial(m, min(p, 1.0))
    sel = rng.choice(m, cnt, replace=False)
    if same_block:
        return u_nodes[iu[sel]], v_nodes[iv[sel]]
    return u_nodes[sel // nv], v_nodes[sel % nv]


def SSBM(n: int, k: int, pin: float, etain: float,
         pout: Optional[float] = None, size_ratio: float = 2,
         etaout: Optional[float] = None, values: str = "ones",
         rng: Optional[np.random.Generator] = None
         ) -> Tuple[Tuple[sp.spmatrix, sp.spmatrix], np.ndarray]:
    """Returns ((A_p, A_n), labels) as in the reference."""
    rng = rng or np.random.default_rng()
    if pout is None:
        pout = pin
    if etaout is None:
        etaout = etain

    size = geometric_sizes(n, k, size_ratio)
    perm = rng.permutation(n)
    assign = np.zeros(n, dtype=int)
    blocks = []
    start = 0
    for c, s in enumerate(size):
        nodes = perm[start:start + s]
        assign[nodes] = c
        blocks.append(np.asarray(nodes))
        start += s

    rows_p, cols_p, vals_p = [], [], []
    rows_n, cols_n, vals_n = [], [], []

    def add(u, v, flip_p):
        if len(u) == 0:
            return
        w = fill(values, len(u), rng)
        neg = rng.random(len(u)) < flip_p
        for arr_r, arr_c, arr_v, mask in (
                (rows_p, cols_p, vals_p, ~neg), (rows_n, cols_n, vals_n, neg)):
            uu, vv, ww = u[mask], v[mask], w[mask]
            arr_r.extend([uu, vv])
            arr_c.extend([vv, uu])
            arr_v.extend([ww, ww])

    def add_between(u, v, flip_p):
        # between communities the edge is negative unless flipped
        if len(u) == 0:
            return
        w = fill(values, len(u), rng)
        pos = rng.random(len(u)) < flip_p
        for arr_r, arr_c, arr_v, mask in (
                (rows_p, cols_p, vals_p, pos), (rows_n, cols_n, vals_n, ~pos)):
            uu, vv, ww = u[mask], v[mask], w[mask]
            arr_r.extend([uu, vv])
            arr_c.extend([vv, uu])
            arr_v.extend([ww, ww])

    for i in range(k):
        u, v = _sample_pairs(blocks[i], blocks[i], pin, rng, same_block=True)
        add(u, v, etain)
        for j in range(i + 1, k):
            u, v = _sample_pairs(blocks[i], blocks[j], pout, rng,
                                 same_block=False)
            add_between(u, v, etaout)

    def build(rows, cols, vals):
        if not rows:
            return sp.csc_matrix((n, n))
        return sp.coo_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(n, n)).tocsc()

    return (build(rows_p, cols_p, vals_p),
            build(rows_n, cols_n, vals_n)), assign
