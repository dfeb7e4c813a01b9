"""Motif adjacency construction for SiGAT / SDGNN (host-side).

The reference builds 38 (SiGAT) / 4 (SDGNN) motif edge lists with O(E*deg)
Python set intersections (SiGAT.py:94-185, SDGNN.py:154-255).  Here the 16
triangle-feature counts collapse to sparse boolean matrix products:

    d1 = [PP, PN, NP, NN]          (out(u) ∩ in(v))
    d2 = [PPt, PNt, NPt, NNt]      (out(u) ∩ out(v))
    d3 = [PtPt, PtNt, NtPt, NtNt]  (in(u)  ∩ out(v))
    d4 = [PtP, PtN, NtP, NtN]      (in(u)  ∩ in(v))

with P / N the boolean positive / negative directed adjacencies — identical
counts, vectorized.
"""
from typing import List, Tuple

import numpy as np
import scipy.sparse as sp


def _bool_adjs(edge_index_s, num_nodes):
    e = np.asarray(edge_index_s)
    pos = e[e[:, 2] > 0][:, :2]
    neg = e[e[:, 2] < 0][:, :2]

    def mat(pairs):
        if len(pairs) == 0:
            return sp.csr_matrix((num_nodes, num_nodes), dtype=np.float64)
        M = sp.coo_matrix((np.ones(len(pairs)), (pairs[:, 0], pairs[:, 1])),
                          shape=(num_nodes, num_nodes)).tocsr()
        M.data = np.minimum(M.data, 1.0)
        return M

    return mat(pos), mat(neg), pos, neg


def _tri_products(P: sp.csr_matrix, N: sp.csr_matrix) -> List[sp.csr_matrix]:
    Pt, Nt = P.T.tocsr(), N.T.tocsr()
    return [
        P @ P, P @ N, N @ P, N @ N,
        P @ Pt, P @ Nt, N @ Pt, N @ Nt,
        Pt @ Pt, Pt @ Nt, Nt @ Pt, Nt @ Nt,
        Pt @ P, Pt @ N, Nt @ P, Nt @ N,
    ]


def _lookup(M, pairs):
    if len(pairs) == 0:
        return np.zeros(0)
    return np.asarray(M[pairs[:, 0], pairs[:, 1]]).ravel()


def sigat_edge_lists(edge_index_s, num_nodes: int) -> List[np.ndarray]:
    """The 38 SiGAT motif edge lists ([2, E] arrays), same order as the
    reference's build_adj_lists (:184-185): 6 base + 16 pos-triangle +
    16 neg-triangle."""
    P, N, pos, neg = _bool_adjs(edge_index_s, num_nodes)
    pos_und = np.vstack([pos, pos[:, [1, 0]]])
    neg_und = np.vstack([neg, neg[:, [1, 0]]])

    def uniq(pairs):
        if len(pairs) == 0:
            return np.zeros((2, 0), np.int64)
        k = np.unique(pairs[:, 0].astype(np.int64) * num_nodes + pairs[:, 1])
        return np.stack([k // num_nodes, k % num_nodes])

    base = [uniq(pos_und), uniq(pos), uniq(pos[:, [1, 0]]),
            uniq(neg_und), uniq(neg), uniq(neg[:, [1, 0]])]

    mats = _tri_products(P, N)
    pos_u = uniq(pos).T  # deduped directed pos edges
    neg_u = uniq(neg).T
    adds1 = [pos_u[_lookup(M, pos_u) > 0].T for M in mats]
    adds2 = [neg_u[_lookup(M, neg_u) > 0].T for M in mats]
    return base + adds1 + adds2


_SDGNN_MASK_POS = np.array([1, 0, 0, 0, 1, 0, 0, 1, 0, 0, 0, 1, 1, 0, 0, 1])
_SDGNN_MASK_NEG = np.array([0, 1, 1, 0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0, 0])


def sdgnn_edge_lists(edge_index_s, num_nodes: int
                     ) -> Tuple[List[np.ndarray], sp.csc_matrix]:
    """SDGNN's 4 motif edge lists [pos_out, pos_in, neg_out, neg_in] and
    the triangle-count weight matrix (reference SDGNN.py:243-255)."""
    P, N, pos, neg = _bool_adjs(edge_index_s, num_nodes)

    def uniq(pairs):
        if len(pairs) == 0:
            return np.zeros((2, 0), np.int64)
        k = np.unique(pairs[:, 0].astype(np.int64) * num_nodes + pairs[:, 1])
        return np.stack([k // num_nodes, k % num_nodes])

    edge_lists = [uniq(pos), uniq(pos[:, [1, 0]]),
                  uniq(neg), uniq(neg[:, [1, 0]])]

    mats = _tri_products(P, N)
    pos_u = uniq(pos).T
    neg_u = uniq(neg).T
    counts_pos = sum(w * _lookup(M, pos_u)
                     for w, M in zip(_SDGNN_MASK_POS, mats))
    counts_neg = sum(w * _lookup(M, neg_u)
                     for w, M in zip(_SDGNN_MASK_NEG, mats))
    # the reference's weight_dict is written pos-loop first then neg-loop
    # (SDGNN.py:231-241), so a pair carrying both signs keeps only the
    # neg-mask count — drop the pos entry for such pairs instead of summing
    if len(pos_u) and len(neg_u):
        pos_keys = pos_u[:, 0] * num_nodes + pos_u[:, 1]
        neg_keys = neg_u[:, 0] * num_nodes + neg_u[:, 1]
        keep = ~np.isin(pos_keys, neg_keys)
        pos_u = pos_u[keep]
        counts_pos = np.atleast_1d(counts_pos)[keep]
    row = np.concatenate([pos_u[:, 0], neg_u[:, 0]])
    col = np.concatenate([pos_u[:, 1], neg_u[:, 1]])
    val = np.concatenate([np.atleast_1d(counts_pos),
                          np.atleast_1d(counts_neg)])
    tri_weight = sp.csc_matrix((val, (row, col)),
                               shape=(num_nodes, num_nodes))
    return edge_lists, tri_weight
