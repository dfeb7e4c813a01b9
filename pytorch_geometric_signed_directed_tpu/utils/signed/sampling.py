"""Host-side edge samplers (numpy) with static output shapes.

The reference calls PyG's negative_sampling / structured_negative_sampling
inside its loss forward passes (utils/signed/link_sign_loss.py:214,255,272).
Rejection sampling is host-friendly, not jit-friendly (SURVEY.md §7): here
it runs on the host once per training step and feeds fixed-shape index
arrays into the jitted loss — same semantics, no recompiles.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _edge_set(edge_index, num_nodes):
    return set((edge_index[0] * num_nodes + edge_index[1]).tolist())


def negative_sampling(edge_index, num_nodes: int,
                      num_neg_samples: Optional[int] = None,
                      rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Sample [2, M] node pairs that are not edges (PyG negative_sampling)."""
    edge_index = np.asarray(edge_index)
    rng = rng or np.random.default_rng()
    m = num_neg_samples or edge_index.shape[1]
    existing = _edge_set(edge_index.astype(np.int64), num_nodes)
    out = np.empty((2, m), dtype=np.int64)
    filled = 0
    while filled < m:
        cand = rng.integers(0, num_nodes, size=(2, 2 * (m - filled) + 8))
        keys = cand[0] * num_nodes + cand[1]
        ok = np.array([k not in existing for k in keys.tolist()])
        ok &= cand[0] != cand[1]
        take = min(ok.sum(), m - filled)
        out[:, filled:filled + take] = cand[:, np.nonzero(ok)[0][:take]]
        filled += take
    return out


def structured_negative_sampling(
    edge_index, num_nodes: int,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For each edge (i, j) sample k with (i, k) not an edge; returns (i, j, k)."""
    edge_index = np.asarray(edge_index).astype(np.int64)
    rng = rng or np.random.default_rng()
    i, j = edge_index[0], edge_index[1]
    existing = _edge_set(edge_index, num_nodes)
    k = rng.integers(0, num_nodes, size=len(i))
    bad = np.array([(a * num_nodes + b) in existing for a, b in zip(i, k)])
    while bad.any():
        k[bad] = rng.integers(0, num_nodes, size=int(bad.sum()))
        bad_idx = np.nonzero(bad)[0]
        still = np.array([(i[t] * num_nodes + k[t]) in existing for t in bad_idx])
        bad[:] = False
        bad[bad_idx[still]] = True
    return i, j, k
