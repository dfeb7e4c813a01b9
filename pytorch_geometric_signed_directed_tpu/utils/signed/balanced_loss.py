"""SSSNET balanced-cut objectives: x^T (D_p - A) x normalizations.

Reference: utils/signed/prob_balanced_normalized_loss.py:7-48,
prob_balanced_ratio_loss.py:7-43, unhappy_ratio.py:7-40.

Each class freezes mat = D_p - (A_p - A_n) (and D_bar for the normalized
variant) into a Propagator at construction; the per-cluster Python loop of
the reference collapses to one operator application + an einsum.
The classes are registered as pytrees so they can ride as jit
ARGUMENTS: at wikirfa scale (N=7634) the dense-tier operators are 233MB
each, and baking them into the HLO as closure constants overflows the
remote-compile transport (HTTP 413) — the same reason bench.py passes
operators through _train_scanner's aux.
"""
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

from ...ops.coo import coo_from_scipy
from ...ops.spmm import propagator_from_coo


def _register_loss_pytree(cls, fields, static_fields=()):
    def flatten(o):
        return (tuple(getattr(o, f) for f in fields),
                tuple(getattr(o, f) for f in static_fields))

    def unflatten(aux, children):
        o = cls.__new__(cls)
        for f, v in zip(fields, children):
            setattr(o, f, v)
        for f, v in zip(static_fields, aux):
            setattr(o, f, v)
        return o

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)


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


_register_loss_pytree(Prob_Balanced_Normalized_Loss, ("mat", "D_bar"))


class Prob_Balanced_Ratio_Loss:
    """sum_k (p_k^T (D_p - A) p_k) / (p_k^T p_k + 1)."""

    def __init__(self, A_p: sp.spmatrix, A_n: sp.spmatrix, mode: str = "auto"):
        D_p = _row_deg_diag(A_p)
        self.mat = _prop((D_p - (A_p - A_n)).tocsc(), mode)

    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        num = jnp.einsum("nk,nk->k", prob, self.mat(prob))
        den = jnp.einsum("nk,nk->k", prob, prob) + 1.0
        return jnp.sum(num / den)


_register_loss_pytree(Prob_Balanced_Ratio_Loss, ("mat",))


class Unhappy_Ratio:
    """sum_k p_k^T (D_p - A) p_k / num_edges."""

    def __init__(self, A_p: sp.spmatrix, A_n: sp.spmatrix, mode: str = "auto"):
        D_p = _row_deg_diag(A_p)
        self.mat = _prop((D_p - (A_p - A_n)).tocsc(), mode)
        self.num_edges = len((A_p - A_n).tocoo().nonzero()[0])

    def __call__(self, prob: jnp.ndarray) -> jnp.ndarray:
        num = jnp.einsum("nk,nk->k", prob, self.mat(prob))
        return jnp.sum(num) / self.num_edges


_register_loss_pytree(Unhappy_Ratio, ("mat",), ("num_edges",))
