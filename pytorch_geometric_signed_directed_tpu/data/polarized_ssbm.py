"""Polarized signed SBM: ambient random graph + embedded SSBM communities.

Reference: data/signed/polarized_SSBM.py:13-200.
"""
import math
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .ssbm import SSBM, geometric_sizes


def polarized_SSBM(total_n: int = 100, num_com: int = 3, N: int = 30,
                   K: int = 2, p: float = 0.1, eta: float = 0.1,
                   size_ratio: float = 1,
                   rng: Optional[np.random.Generator] = None
                   ) -> Tuple[Tuple[sp.spmatrix, sp.spmatrix],
                              np.ndarray, np.ndarray]:
    rng = rng or np.random.default_rng()
    # ambient graph: sample ordered pairs, keep the asymmetric ones
    # (the reference's reversed-set difference, :40-43), split half
    # positive / half negative, symmetrize
    select_num = math.floor(total_n * p / 4 * total_n)
    pair_ids = rng.choice(total_n * total_n, size=min(
        2 * select_num, total_n * total_n), replace=False)
    fwd = set(pair_ids.tolist())
    rev_ids = (pair_ids % total_n) * total_n + pair_ids // total_n
    keep = np.array([rid not in fwd for rid in rev_ids.tolist()])
    full_idx = rev_ids[keep]
    select_num = len(full_idx) // 2

    def sym_mat(ids):
        r, c = ids // total_n, ids % total_n
        rows = np.concatenate([r, c])
        cols = np.concatenate([c, r])
        return sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                             shape=(total_n, total_n)).tolil()

    large_A_p = sym_mat(full_idx[:select_num])
    large_A_n = sym_mat(full_idx[select_num:2 * select_num])
    large_labels = np.zeros(total_n)
    conflict_groups = np.zeros(total_n)

    total_n_com = num_com * N
    size = geometric_sizes(total_n_com, num_com, size_ratio)
    counter = 0
    for com in range(num_com):
        com_size = size[com]
        (A_p, A_n), labels = SSBM(n=com_size, k=K, pin=p, etain=eta,
                                  size_ratio=size_ratio, rng=rng)
        large_A_p[counter:counter + com_size,
                  counter:counter + com_size] = A_p
        large_A_n[counter:counter + com_size,
                  counter:counter + com_size] = A_n
        large_labels[counter:counter + com_size] = labels + (2 * com + 1)
        conflict_groups[counter:counter + com_size] = com + 1
        counter += com_size

    # permute node ids (the reference pins this permutation seed, :97)
    perm = np.random.RandomState(2020).permutation(total_n)

    def permute(M):
        M = M.tocoo()
        return sp.coo_matrix((M.data, (perm[M.row], perm[M.col])),
                             shape=(total_n, total_n)).tocsc()

    large_A_p = permute(large_A_p)
    large_A_n = permute(large_A_n)
    new_labels = np.zeros(total_n)
    new_groups = np.zeros(total_n)
    new_labels[perm] = large_labels
    new_groups[perm] = conflict_groups

    # largest connected component of the signed graph
    _, comp = sp.csgraph.connected_components(
        (large_A_p - large_A_n).tocsr(), directed=False)
    keep = np.nonzero(comp == np.bincount(comp).argmax())[0]
    A_p_new = sp.lil_matrix(large_A_p[keep][:, keep])
    A_n_new = sp.lil_matrix(large_A_n[keep][:, keep])
    labels_new = new_labels[keep]
    conflict_groups = new_groups[keep]

    # degree-fixing pass: give degree-<=2 nodes extra edges (:127-199)
    A_bar = sp.lil_matrix(A_p_new + A_n_new)
    row_sum = np.asarray(A_bar.sum(axis=1)).ravel()
    n_new = len(labels_new)
    if (row_sum <= 2).sum():
        for i in np.arange(n_new)[row_sum <= 2]:
            row_to_fix = A_bar[i].toarray().ravel()
            deg = int((row_to_fix != 0).sum())
            if deg not in (1, 2):
                continue
            n_add = 2 if deg == 1 else 1
            empty = np.arange(n_new)[row_to_fix == 0]
            node_idx = rng.choice(empty, size=n_add, replace=False)
            flips = rng.binomial(1, eta, size=n_add)
            for j, flip_ in zip(node_idx, flips):
                A_bar[i, j] = 1
                A_bar[j, i] = 1
                if conflict_groups[i] == conflict_groups[j]:
                    same = labels_new[j] == labels_new[i]
                    neg = (flip_ if same else not flip_)
                else:
                    neg = rng.binomial(1, 0.5)
                target = A_n_new if neg else A_p_new
                target[i, j] = 1
                target[j, i] = 1
    return (A_p_new, A_n_new), labels_new, conflict_groups
