"""MXU scatter kernel (scatter-as-matmul segment sum) parity tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from pytorch_geometric_signed_directed_tpu.ops import (
    build_coo, make_propagator)
from pytorch_geometric_signed_directed_tpu.ops.pallas.scatter_mxu import (
    build_scatter_plan, mxu_from_coo, mxu_spmm, permute_edge_data,
    scatter_sum)


def case(n, e, f, seed):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    val = rng.standard_normal(e).astype(np.float32)
    x = rng.standard_normal((n, f)).astype(np.float32)
    S = sp.coo_matrix((val, (row, col)), shape=(n, n)).tocsr()
    A = build_coo(row, col, val, n, sum_duplicates=True)
    return A, S, x


@pytest.mark.parametrize("shape", [(300, 2000, 16), (1000, 9000, 40),
                                   (64, 50, 8)])
def test_mxu_spmm_matches_scipy(shape):
    n, e, f = shape
    A, S, x = case(n, e, f, seed=n)
    M = mxu_from_coo(A)
    out = np.asarray(mxu_spmm(M, jnp.asarray(x)))
    np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)


def test_mxu_grad_is_transpose():
    A, S, x = case(400, 3000, 12, seed=7)
    M = mxu_from_coo(A)
    g = np.random.default_rng(1).standard_normal((400, 12)).astype(np.float32)
    grad = jax.grad(lambda v: jnp.sum(mxu_spmm(M, v) * jnp.asarray(g)))(
        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), S.T @ g, rtol=1e-4,
                               atol=1e-4)


def test_mxu_propagator_mode():
    A, S, x = case(256, 1500, 10, seed=9)
    row = np.asarray(A.row)[: A.nnz]
    col = np.asarray(A.col)[: A.nnz]
    val = np.asarray(A.val)[: A.nnz]
    P = make_propagator(row, col, val, 256, mode="mxu")
    out = np.asarray(jax.jit(lambda p, v: p(v))(P, jnp.asarray(x)))
    np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)


def test_empty_rows_zero():
    A = build_coo([0, 300], [5, 7], [1.0, 2.0], 400)
    M = mxu_from_coo(A)
    out = np.asarray(mxu_spmm(M, jnp.ones((400, 4), np.float32)))
    assert out[0, 0] == 1.0 and out[300, 0] == 2.0
    assert np.abs(out[1:300]).sum() == 0


def test_plan_permutation_roundtrip():
    rng = np.random.default_rng(3)
    row = np.sort(rng.integers(0, 500, 4000))
    plan, perm = build_scatter_plan(row, 500)
    marker = np.arange(4000)
    (pm,) = permute_edge_data(perm, marker)
    valid = perm >= 0
    assert sorted(pm[valid].tolist()) == sorted(marker.tolist())
    # padded entries zero
    assert (pm[~valid] == 0).all()


def test_custom_chunk_size():
    A, S, x = case(500, 4000, 8, seed=21)
    from pytorch_geometric_signed_directed_tpu.ops.pallas.scatter_mxu import (
        MXUCoo)
    row = np.asarray(A.row)[: A.nnz]
    col = np.asarray(A.col)[: A.nnz]
    val = np.asarray(A.val)[: A.nnz]
    plan, perm = build_scatter_plan(row, 500, chunk=512)
    col_p, val_p = permute_edge_data(perm, col.astype(np.int32),
                                     val.astype(np.float32))
    M = MXUCoo(plan=plan, col=jnp.asarray(col_p), val=jnp.asarray(val_p),
               num_cols=500, transposed=None)
    from pytorch_geometric_signed_directed_tpu.ops.pallas.scatter_mxu import (
        _mxu_forward)
    out = np.asarray(_mxu_forward(M, jnp.asarray(x)))
    np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)


def test_sparse_rows_skip_empty_windows():
    # only 2 of 32 windows have edges: plan must not pad the other 30
    A = build_coo([0, 4000], [1, 2], [1.0, 2.0], 4096)
    M = mxu_from_coo(A)
    assert M.plan.win.shape[0] == 2  # one chunk per non-empty window
    out = np.asarray(mxu_spmm(M, jnp.ones((4096, 4), np.float32)))
    assert out[0, 0] == 1.0 and out[4000, 0] == 2.0
    assert np.abs(out).sum() == (1.0 + 2.0) * 4
