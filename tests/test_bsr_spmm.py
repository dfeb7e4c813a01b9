"""Pallas BSR SpMM kernel parity tests (interpret mode on the CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from pytorch_geometric_signed_directed_tpu.ops import build_coo, propagator_from_coo
from pytorch_geometric_signed_directed_tpu.ops.pallas import bsr_from_coo, bsr_spmm


def make_case(n_rows, n_cols, e, f, seed):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n_rows, e)
    col = rng.integers(0, n_cols, e)
    val = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n_cols, f)).astype(np.float32)
    S = sp.coo_matrix((val, (row, col)), shape=(n_rows, n_cols)).tocsr()
    A = build_coo(row, col, val, n_rows, num_cols=n_cols, sum_duplicates=True)
    return A, S, x


@pytest.mark.parametrize("shape", [(300, 300, 2000, 16), (130, 520, 900, 40)])
def test_bsr_matches_scipy(shape):
    n_rows, n_cols, e, f = shape
    A, S, x = make_case(n_rows, n_cols, e, f, seed=n_rows)
    B = bsr_from_coo(A)
    out = np.asarray(bsr_spmm(B, jnp.asarray(x)))
    np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)


def test_bsr_empty_rows_are_zero():
    # rows 128..255 have no edges: the zero-block padding must still
    # initialise that output tile.
    A = build_coo([0, 300], [5, 7], [1.0, 2.0], 400)
    B = bsr_from_coo(A)
    x = np.ones((400, 8), np.float32)
    out = np.asarray(bsr_spmm(B, jnp.asarray(x)))
    assert out[0, 0] == 1.0 and out[300, 0] == 2.0
    assert np.abs(out[128:256]).sum() == 0


def test_bsr_grad_matches_transpose():
    A, S, x = make_case(200, 200, 1500, 8, seed=7)
    B = bsr_from_coo(A)
    g = np.random.default_rng(9).standard_normal((200, 8)).astype(np.float32)
    grad = jax.grad(lambda x_: jnp.sum(bsr_spmm(B, x_) * jnp.asarray(g)))(
        jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(grad), S.T @ g, rtol=1e-4, atol=1e-4)


def test_bsr_propagator_tier():
    A, S, x = make_case(256, 256, 2000, 12, seed=11)
    P = propagator_from_coo(A, mode="bsr")
    out = np.asarray(P(jnp.asarray(x)))
    np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)
