"""SSSNET balanced-cut objectives: x^T (D_p - A) x normalizations.

Reference: utils/signed/prob_balanced_normalized_loss.py:7-48,
prob_balanced_ratio_loss.py:7-43, unhappy_ratio.py:7-40.

Each class freezes mat = D_p - (A_p - A_n) (and D_bar for the normalized
variant) into a Propagator at construction; the per-cluster Python loop of
the reference collapses to one operator application + an einsum.
"""
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp

from ...ops.coo import coo_from_scipy
from ...ops.spmm import propagator_from_coo


def _prop(M: sp.spmatrix, mode: str = "auto"):
    return propagator_from_coo(coo_from_scipy(M.tocoo()), mode=mode)


def _row_deg_diag(A: sp.spmatrix) -> sp.spmatrix:
    return sp.diags(A.transpose().sum(axis=0).tolist(), [0]).tocsc()


class Prob_Balanced_Normalized_Loss:
    """sum_k (p_k^T (D_p - A) p_k) / (p_k^T D_bar p_k + eps)."""

    def __init__(self, A_p: sp.spmatrix, A_n: sp.spmatrix, mode: str = "auto"):
        D_p = _row_deg_diag(A_p)
        D_n = _row_deg_diag(A_n)
        self.mat = _prop((D_p - (A_p - A_n)).tocsc(), mode)
        self.D_bar = _prop((D_p + D_n).tocsc(), mode)

    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        num = jnp.einsum("nk,nk->k", prob, self.mat(prob))
        den = jnp.einsum("nk,nk->k", prob, self.D_bar(prob)) + 1e-6
        return jnp.sum(num / den)


class Prob_Balanced_Ratio_Loss:
    """sum_k (p_k^T (D_p - A) p_k) / (p_k^T p_k + 1)."""

    def __init__(self, A_p: sp.spmatrix, A_n: sp.spmatrix, mode: str = "auto"):
        D_p = _row_deg_diag(A_p)
        self.mat = _prop((D_p - (A_p - A_n)).tocsc(), mode)

    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        num = jnp.einsum("nk,nk->k", prob, self.mat(prob))
        den = jnp.einsum("nk,nk->k", prob, prob) + 1.0
        return jnp.sum(num / den)


class Unhappy_Ratio:
    """sum_k p_k^T (D_p - A) p_k / num_edges."""

    def __init__(self, A_p: sp.spmatrix, A_n: sp.spmatrix, mode: str = "auto"):
        D_p = _row_deg_diag(A_p)
        self.mat = _prop((D_p - (A_p - A_n)).tocsc(), mode)
        self.num_edges = len((A_p - A_n).tocoo().nonzero()[0])

    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        num = jnp.einsum("nk,nk->k", prob, self.mat(prob))
        return jnp.sum(num) / self.num_edges
