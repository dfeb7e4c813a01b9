"""Spectral node-feature builders (host-side, one-time preprocessing).

Reference implementations:
  * create_spectral_features — utils/signed/create_spectral_features.py:8-41
  * hermitian_features — data/directed/DirectedData.py:65-81
  * signed_laplacian_eig_features — data/signed/SignedData.py:111-132
  * spectral_adjacency_reg_features — data/signed/SignedData.py:134-236
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as sp


def _sqrtinvdiag(M: sp.spmatrix) -> sp.csc_matrix:
    """1/sqrt of a positive diagonal (reference SignedData.py:13-25)."""
    d = M.diagonal()
    dd = [1 / max(np.sqrt(x), 1 / 999999999) for x in d]
    return sp.dia_matrix((dd, [0]), shape=(len(d), len(d))).tocsc()


def create_spectral_features(pos_edge_index, neg_edge_index, node_num: int,
                             dim: int, seed: Optional[int] = None) -> np.ndarray:
    """TruncatedSVD embedding of the symmetrized ±1 adjacency (SGCN init)."""
    from sklearn.decomposition import TruncatedSVD

    pos = np.asarray(pos_edge_index)
    neg = np.asarray(neg_edge_index)
    row = np.concatenate([pos[0], neg[0]])
    col = np.concatenate([pos[1], neg[1]])
    val = np.concatenate([np.full(pos.shape[1], 2.0), np.zeros(neg.shape[1])])
    # symmetrize then coalesce-sum, then shift by -1 (reference :27-31)
    r = np.concatenate([row, col])
    c = np.concatenate([col, row])
    v = np.concatenate([val, val])
    key = r.astype(np.int64) * node_num + c.astype(np.int64)
    uniq, inv = np.unique(key, return_inverse=True)
    sv = np.zeros(len(uniq))
    np.add.at(sv, inv, v)
    sv = sv - 1.0
    A = sp.coo_matrix((sv, (uniq // node_num, uniq % node_num)),
                      shape=(node_num, node_num))
    svd = TruncatedSVD(n_components=dim, n_iter=128, random_state=seed)
    svd.fit(A)
    return svd.components_.T.astype(np.float32)


def hermitian_features(A: sp.spmatrix, k: int = 2) -> np.ndarray:
    """SVD features of the rw-normalized Hermitian (A - A^T) i (DirectedData)."""
    from sklearn.preprocessing import StandardScaler

    H = (A - A.transpose()) * 1j
    H_abs = np.abs(H)
    H_rw = sp.diags(1 / np.array(H_abs.sum(1))[:, 0]).dot(H)
    u, _, _ = sp.linalg.svds(H_rw, k=k)
    feats = np.concatenate((np.real(u), np.imag(u)), axis=1)
    return StandardScaler().fit(feats).transform(feats).astype(np.float32)


def signed_laplacian_eig_features(A_p: sp.spmatrix, A_n: sp.spmatrix,
                                  k: int = 2) -> np.ndarray:
    """Eigenvectors of the normalized signed Laplacian, weighted 1/eigval."""
    A = (A_p - A_n).tocsc()
    D_p = sp.diags(A_p.sum(axis=0).tolist(), [0]).tocsc()
    D_n = sp.diags(A_n.sum(axis=0).tolist(), [0]).tocsc()
    d = _sqrtinvdiag(D_p + D_n)
    L = sp.eye(A_p.shape[0], format="csc") - d * A * d
    vals, vecs = sp.linalg.eigs(L, int(k), maxiter=A_p.shape[0], which="LR")
    vecs = vecs / vals
    return np.real(vecs).astype(np.float32)


def spectral_adjacency_reg_features(
    A_p: sp.spmatrix,
    A_n: sp.spmatrix,
    k: int = 2,
    normalization: Optional[str] = None,
    tau_p=None,
    tau_n=None,
    eigens=None,
    mi=None,
) -> np.ndarray:
    """Eigen features of the regularized signed adjacency (SSSNET inputs).

    normalization in {None, 'sym', 'sym_sep'}, matching the reference's
    implemented branches (SignedData.py:191-228).
    """
    A = (A_p - A_n).tocsc()
    A_p = sp.csc_matrix(A_p)
    A_n = sp.csc_matrix(A_n)
    D_p = sp.diags(A_p.sum(axis=0).tolist(), [0]).tocsc()
    D_n = sp.diags(A_n.sum(axis=0).tolist(), [0]).tocsc()
    Dbar = D_p + D_n
    size = A_p.shape[0]
    if eigens is None:
        eigens = k
    if mi is None:
        mi = size
    if tau_p is None or tau_n is None:
        tau_p = 0.25 * np.mean(Dbar.data) / size
        tau_n = 0.25 * np.mean(Dbar.data) / size

    p_tau = A_p.copy().astype(np.float32)
    n_tau = A_n.copy().astype(np.float32)
    p_tau.data += tau_p
    n_tau.data += tau_n

    Dbar_c = size - Dbar.diagonal()
    Dbar_tau_s = (p_tau + n_tau).sum(axis=0) + (Dbar_c * abs(tau_p - tau_n))[None, :]
    Dbar_tau = sp.diags(Dbar_tau_s.tolist(), [0])

    if normalization is None:
        matrix = A
        delta_tau = tau_p - tau_n

        def mv(v):
            return matrix.dot(v) + delta_tau * v.sum()

    elif normalization == "sym":
        d = _sqrtinvdiag(Dbar_tau)
        matrix = d * A * d
        dd = d.diagonal()
        tau_dd = (tau_p - tau_n) * dd

        def mv(v):
            return matrix.dot(v) + tau_dd * dd.dot(v)

    elif normalization == "sym_sep":
        dp = _sqrtinvdiag(D_p + sp.diags([size * tau_p] * size).tocsc())
        matrix = dp * A_p * dp
        dn = _sqrtinvdiag(D_n + sp.diags([size * tau_n] * size).tocsc())
        matrix = matrix - (dn * A_n * dn)
        dpd = dp.diagonal()
        dnd = dn.diagonal()
        tau_dp = tau_p * dpd
        tau_dn = tau_n * dnd

        def mv(v):
            return matrix.dot(v) + tau_dp * dpd.dot(v) - tau_dn * dnd.dot(v)

    else:
        raise NameError("Error in choosing normalization!")

    matrix_o = sp.linalg.LinearOperator(matrix.shape, matvec=mv)
    w, v = sp.linalg.eigs(matrix_o, int(eigens), maxiter=mi, which="LR")
    v = v * w
    return np.real(v).astype(np.float32)
