"""Unit tests for the native sparse tier (ops/).

Mirrors the reference's edge_index-vs-SparseTensor numerical-equivalence
pattern (reference test/directed_test.py:195-212): every execution tier of
the SpMM must agree with a dense numpy reference to allclose tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from pytorch_geometric_signed_directed_tpu.ops import (
    COO,
    build_coo,
    coo_from_scipy,
    make_propagator,
    propagator_from_coo,
    segment_mean,
    segment_softmax,
    segment_sum,
    spmm_coo,
)


def random_graph(n=50, e=400, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    val = rng.standard_normal(e).astype(np.float32) if weighted else None
    return row, col, val


class TestCOO:
    def test_build_sorts_and_pads(self):
        row, col, val = random_graph()
        A = build_coo(row, col, val, 50)
        r = np.asarray(A.row)[: A.nnz]
        assert (np.diff(r) >= 0).all()
        assert (np.asarray(A.row)[A.nnz:] == 50).all()
        assert np.asarray(A.val)[A.nnz:].sum() == 0

    def test_dense_matches_scipy(self):
        row, col, val = random_graph()
        A = build_coo(row, col, val, 50, sum_duplicates=True)
        S = sp.coo_matrix((val, (row, col)), shape=(50, 50)).toarray()
        np.testing.assert_allclose(np.asarray(A.to_dense()), S, rtol=1e-5, atol=1e-5)

    def test_sum_duplicates(self):
        A = build_coo([0, 0, 1], [1, 1, 2], [1.0, 2.0, 3.0], 3, sum_duplicates=True)
        assert A.nnz == 2
        np.testing.assert_allclose(
            np.asarray(A.to_dense()),
            [[0, 3, 0], [0, 0, 3], [0, 0, 0]],
        )

    def test_transpose(self):
        row, col, val = random_graph(seed=3)
        A = build_coo(row, col, val, 50, sum_duplicates=True)
        np.testing.assert_allclose(
            np.asarray(A.transpose().to_dense()),
            np.asarray(A.to_dense()).T,
            rtol=1e-5, atol=1e-5,
        )

    def test_roundtrip_scipy(self):
        row, col, val = random_graph(seed=5)
        S = sp.coo_matrix((val, (row, col)), shape=(50, 50)).tocsr()
        A = coo_from_scipy(S)
        np.testing.assert_allclose(np.asarray(A.to_dense()), S.toarray(),
                                   rtol=1e-5, atol=1e-5)


class TestSegment:
    def test_segment_sum_drops_padding(self):
        data = jnp.array([1.0, 2.0, 3.0, 99.0])
        ids = jnp.array([0, 0, 1, 3])  # 3 == num_segments -> padding
        out = segment_sum(data, ids, 3)
        np.testing.assert_allclose(np.asarray(out), [3.0, 3.0, 0.0])

    def test_segment_mean(self):
        data = jnp.array([[1.0], [3.0], [5.0]])
        ids = jnp.array([0, 0, 2])
        out = segment_mean(data, ids, 3)
        np.testing.assert_allclose(np.asarray(out), [[2.0], [0.0], [5.0]])

    def test_segment_softmax_matches_dense(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal(12).astype(np.float32))
        ids = jnp.asarray(np.sort(rng.integers(0, 4, 12)))
        out = np.asarray(segment_softmax(logits, ids, 4, indices_are_sorted=True))
        for s in range(4):
            m = np.asarray(ids) == s
            if m.any():
                expect = np.exp(np.asarray(logits)[m])
                expect /= expect.sum()
                np.testing.assert_allclose(out[m], expect, rtol=1e-5)

    def test_segment_softmax_padding_safe(self):
        logits = jnp.array([1.0, 2.0, 3.0])
        ids = jnp.array([0, 2, 2])  # 2 == num_segments -> padding entries
        out = np.asarray(segment_softmax(logits, ids, 2))
        np.testing.assert_allclose(out, [1.0, 0.0, 0.0], atol=1e-6)


class TestSpMM:
    @pytest.mark.parametrize("mode", ["segment", "dense"])
    def test_tiers_match_scipy(self, mode):
        row, col, val = random_graph(n=64, e=500, seed=1)
        x = np.random.default_rng(2).standard_normal((64, 16)).astype(np.float32)
        S = sp.coo_matrix((val, (row, col)), shape=(64, 64)).tocsr()
        P = make_propagator(row, col, val, 64, mode=mode)
        out = np.asarray(jax.jit(lambda p, x_: p(x_))(P, jnp.asarray(x)))
        np.testing.assert_allclose(out, S @ x, rtol=1e-4, atol=1e-4)

    def test_spmm_grad_is_transpose(self):
        """d/dx sum(A@x * g) == A.T @ g — autodiff through segment tier."""
        row, col, val = random_graph(n=32, e=200, seed=4)
        A = build_coo(row, col, val, 32, sum_duplicates=True)
        g = np.random.default_rng(5).standard_normal((32, 8)).astype(np.float32)
        x = np.random.default_rng(6).standard_normal((32, 8)).astype(np.float32)
        grad = jax.grad(lambda x_: jnp.sum(spmm_coo(A, x_) * g))(jnp.asarray(x))
        S = sp.coo_matrix(
            (np.asarray(A.val)[: A.nnz],
             (np.asarray(A.row)[: A.nnz], np.asarray(A.col)[: A.nnz])),
            shape=(32, 32)).tocsr()
        np.testing.assert_allclose(np.asarray(grad), S.T @ g, rtol=1e-4, atol=1e-4)

    def test_rectangular(self):
        row = [0, 1, 2]
        col = [5, 3, 0]
        A = build_coo(row, col, None, 3, num_cols=6)
        x = np.eye(6, dtype=np.float32)
        out = np.asarray(spmm_coo(A, jnp.asarray(x)))
        expect = np.zeros((3, 6), np.float32)
        expect[0, 5] = expect[1, 3] = expect[2, 0] = 1
        np.testing.assert_allclose(out, expect)

    def test_auto_mode_picks_dense_small(self):
        P = make_propagator([0, 1], [1, 0], None, 8)
        assert P.mode == "dense"

    def test_jit_once_per_shape(self):
        row, col, val = random_graph(n=40, e=100)
        P = make_propagator(row, col, val, 40, mode="segment")
        f = jax.jit(lambda p, x: p(x))
        x = jnp.ones((40, 4))
        f(P, x)
        f(P, 2 * x)  # same shape: must not retrace (smoke: no error)


class TestReorder:
    def test_rcm_reduces_block_count(self):
        from pytorch_geometric_signed_directed_tpu.ops.reorder import (
            apply_permutation, block_density, rcm_permutation)
        # banded graph scrambled by a random permutation
        rng = np.random.default_rng(0)
        n = 1024
        base_row = np.arange(n - 1)
        base_col = base_row + 1
        extra = rng.integers(0, 20, (2, 2000))
        row = np.concatenate([base_row, extra[0] + np.arange(2000) % (n - 20)])
        col = np.concatenate([base_col, extra[1] + np.arange(2000) % (n - 20)])
        scram = rng.permutation(n)
        srow, scol = scram[row], scram[col]
        before = block_density(srow, scol, n)
        perm = rcm_permutation(srow, scol, n)
        nrow, ncol, inv = apply_permutation(srow, scol, perm)
        after = block_density(nrow, ncol, n)
        assert after < before * 0.5
        # relabeling is a bijection consistent with perm
        assert (inv[perm] == np.arange(n)).all()

    def test_matmul_precision_knob(self):
        from pytorch_geometric_signed_directed_tpu.ops.spmm import (
            get_matmul_precision, set_matmul_precision)
        old = get_matmul_precision()
        try:
            set_matmul_precision("default")
            assert get_matmul_precision() == jax.lax.Precision.DEFAULT
        finally:
            set_matmul_precision(old)
