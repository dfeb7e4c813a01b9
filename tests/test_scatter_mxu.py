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


def test_invalid_geometry_asserts_on_native_path_too():
    # the chunk/window validation must fire BEFORE the e >= 2^20 native
    # early-return, so an invalid geometry fails fast with the intended
    # message instead of a misaligned plan failing later in the kernel
    rng = np.random.default_rng(3)
    row = rng.integers(0, 4096, 1 << 20).astype(np.int64)
    with pytest.raises(AssertionError, match="chunk"):
        build_scatter_plan(row, 4096, chunk=7)
    with pytest.raises(AssertionError, match="window"):
        build_scatter_plan(row, 4096, window=100, chunk=512)


def test_sparse_rows_skip_empty_windows():
    # only 2 of 32 windows have edges: plan must not pad the other 30
    A = build_coo([0, 4000], [1, 2], [1.0, 2.0], 4096)
    M = mxu_from_coo(A)
    assert M.plan.win.shape[0] == 2  # one chunk per non-empty window
    out = np.asarray(mxu_spmm(M, jnp.ones((4096, 4), np.float32)))
    assert out[0, 0] == 1.0 and out[4000, 0] == 2.0
    assert np.abs(out).sum() == (1.0 + 2.0) * 4


def test_dual_propagator_matches_separate():
    """Fused lane-stacked dual apply == separate SpMMs, fwd and bwd."""
    import jax
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm, dual_spmm_stacked, spmm_coo)

    rng = np.random.default_rng(7)
    n, e = 300, 2500
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    va = rng.standard_normal(e).astype(np.float32)
    vb = rng.standard_normal(e).astype(np.float32)
    # shared coalesced structure
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    row, col, va, vb = coalesce_edges(row, col, va, vb, num_cols=n)
    A = build_coo(row, col, va, n)
    B = build_coo(row, col, vb, n)

    for mode in ("mxu", "segment"):
        D = dual_propagator(row, col, va, vb, n, mode=mode)
        xa = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
        xb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
        ya, yb = dual_spmm(D, xa, xb)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(spmm_coo(A, xa)),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(spmm_coo(B, xb)),
                                   rtol=1e-4, atol=1e-4)

        # backward = transposed forward
        def loss(x):
            o = dual_spmm_stacked(D, x)
            return (o ** 2).sum()

        xcat = jnp.concatenate([xa, xb], axis=1)
        g = jax.grad(loss)(xcat)

        def loss_ref(x):
            oa = spmm_coo(A, x[:, :8])
            ob = spmm_coo(B, x[:, 8:])
            return (oa ** 2).sum() + (ob ** 2).sum()

        g_ref = jax.grad(loss_ref)(xcat)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-3, atol=1e-3)


def test_magnet_pair_dual_consistent_with_singles():
    """magnet_propagators' fused dual agrees with its re/im Propagators."""
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)
    from pytorch_geometric_signed_directed_tpu.ops.spmm import dual_spmm

    rng = np.random.default_rng(3)
    n, e = 200, 1200
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.random(e).astype(np.float32)
    pair = magnet_propagators(ei, w, q=0.1, num_nodes=n, mode="mxu")
    assert pair.dual is not None
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    ya, yb = dual_spmm(pair.dual, x, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(pair.re(x)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(pair.im(x)),
                               rtol=1e-4, atol=1e-4)


def test_streamed_scatter_multi_block():
    """Blocked streaming (bounded-memory path for giant graphs) matches
    scipy, forward and backward, across many window-aligned blocks."""
    import jax
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n, e = 5000, 60000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    val = rng.standard_normal(e).astype(np.float32)
    S = sp.coo_matrix((val, (row, col)), shape=(n, n)).tocsr()
    A = build_coo(row, col, val, n)
    M = mxu_from_coo(A, stream_threshold=5000, stream_block_edges=8192)
    assert M.stream is not None and M.stream.win.shape[0] > 3
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    out = np.asarray(mxu_spmm(M, x))
    np.testing.assert_allclose(out, S @ np.asarray(x), rtol=1e-4, atol=1e-4)

    g = jax.grad(lambda xx: (mxu_spmm(M, xx) ** 2).sum())(x)
    g_ref = jax.grad(lambda xx: ((jnp.asarray(S.toarray()) @ xx) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_streamed_dual_propagator():
    import scipy.sparse as sp
    from pytorch_geometric_signed_directed_tpu.ops import spmm as spmm_mod
    from pytorch_geometric_signed_directed_tpu.ops.coalesce import (
        coalesce_edges)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)

    rng = np.random.default_rng(2)
    n, e = 3000, 30000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    va = rng.standard_normal(e).astype(np.float32)
    vb = rng.standard_normal(e).astype(np.float32)
    row, col, va, vb = coalesce_edges(row, col, va, vb, num_cols=n)
    Sa = sp.coo_matrix((va, (row, col)), shape=(n, n)).tocsr()
    Sb = sp.coo_matrix((vb, (row, col)), shape=(n, n)).tocsr()
    orig_t, orig_b = sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES
    sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES = 5000, 8192
    try:
        D = spmm_mod.dual_propagator(row, col, va, vb, n, mode="mxu")
    finally:
        sm.STREAM_THRESHOLD_EDGES, sm.STREAM_BLOCK_EDGES = orig_t, orig_b
    assert D.stream is not None and D.stream.win.shape[0] > 1
    xa = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    xb = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ya, yb = spmm_mod.dual_spmm(D, xa, xb)
    np.testing.assert_allclose(np.asarray(ya), Sa @ np.asarray(xa),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yb), Sb @ np.asarray(xb),
                               rtol=1e-4, atol=1e-4)


def test_streamed_hub_window_straddles_blocks():
    """A hub row with more edges than a whole block must not inflate the
    block size: its window run straddles blocks, and cross-block
    accumulation through the aliased carry stays exact."""
    import jax

    rng = np.random.default_rng(9)
    n, cap = 2000, 8192
    hub_e = 3 * cap  # one window, three blocks worth of edges
    row = np.concatenate([np.full(hub_e, 77), rng.integers(0, n, 6000)])
    col = np.concatenate([rng.integers(0, n, hub_e),
                          rng.integers(0, n, 6000)])
    val = rng.standard_normal(len(row)).astype(np.float32)
    S = sp.coo_matrix((val, (row, col)), shape=(n, n)).tocsr()
    A = build_coo(row, col, val, n)
    M = mxu_from_coo(A, stream_threshold=5000, stream_block_edges=cap)
    assert M.stream is not None
    # bounded: no block may exceed the cap by more than one chunk
    assert M.stream.edges_per_block <= cap + 8192
    assert M.stream.win.shape[0] >= 3
    x = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    out = np.asarray(mxu_spmm(M, x))
    np.testing.assert_allclose(out, S @ np.asarray(x), rtol=1e-4, atol=1e-4)
    g = jax.grad(lambda xx: (mxu_spmm(M, xx) ** 2).sum())(x)
    g_ref = jax.grad(lambda xx: ((jnp.asarray(S.toarray()) @ xx) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)


def test_dual_spmm_width_mismatch_raises():
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm, dual_spmm_stacked)

    rng = np.random.default_rng(5)
    n, e = 100, 400
    D = dual_propagator(rng.integers(0, n, e), rng.integers(0, n, e),
                        np.ones(e, np.float32), np.ones(e, np.float32),
                        n, mode="segment")
    xa = jnp.ones((n, 8), np.float32)
    xb = jnp.ones((n, 6), np.float32)
    with pytest.raises(ValueError, match="feature width"):
        dual_spmm(D, xa, xb)
    with pytest.raises(ValueError, match="even"):
        dual_spmm_stacked(D, jnp.ones((n, 7), np.float32))


def test_bf16_message_dtype_close_to_f32():
    from pytorch_geometric_signed_directed_tpu.ops import spmm as spmm_mod

    rng = np.random.default_rng(4)
    n, e = 400, 3000
    A = build_coo(rng.integers(0, n, e), rng.integers(0, n, e),
                  rng.standard_normal(e).astype(np.float32), n)
    M = mxu_from_coo(A)
    x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    ref = np.asarray(mxu_spmm(M, x))
    spmm_mod.set_message_dtype("bf16")
    try:
        out = np.asarray(mxu_spmm(M, x))
    finally:
        spmm_mod.set_message_dtype(None)
    rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
    assert 0 < rel < 2e-2  # bf16-rounded messages, f32 accumulation


@pytest.mark.slow
def test_col_split_forward_and_grad(monkeypatch):
    """Hot/cold column-split layouts (flat and streamed) match scipy and
    the unsplit path, forward and backward."""
    from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu

    monkeypatch.setattr(scatter_mxu, "COL_SPLIT_MIN_COLS", 100)
    monkeypatch.setattr(scatter_mxu, "GATHER_FAST_ROWS", 64)
    monkeypatch.setattr(scatter_mxu, "COL_SPLIT_MIN_COVERAGE", 0.0)

    n, e, f = 600, 7000, 24
    rng = np.random.default_rng(12)
    # skewed col degrees so a real hot set exists
    col = (rng.zipf(1.3, e) - 1) % n
    row = rng.integers(0, n, e)
    val = rng.standard_normal(e).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    S = sp.coo_matrix((val, (row, col)), shape=(n, n)).tocsr()
    ref = S @ np.asarray(x)
    A = build_coo(row, col, val, n, sum_duplicates=True)

    for threshold in (10 ** 9, 2000):   # flat split / streamed split
        M = mxu_from_coo(A, stream_threshold=threshold,
                         stream_block_edges=1500)
        assert M.hot_ids is not None
        if threshold == 2000:
            assert M.stream is not None and M.stream.hot_blocks > 0
        else:
            assert M.plan.hot_chunks > 0
        out = np.asarray(mxu_spmm(M, x))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
        # backward = transposed forward; check against dense
        g = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
        (dx,) = jax.grad(lambda xx: (mxu_spmm(M, xx) * g).sum())(x),
        np.testing.assert_allclose(np.asarray(dx), S.T @ np.asarray(g),
                                   rtol=1e-4, atol=1e-4)


def test_col_split_dual_matches_unsplit(monkeypatch):
    from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_propagator, dual_spmm_stacked)

    n, e, f = 500, 6000, 12
    rng = np.random.default_rng(5)
    col = (rng.zipf(1.3, e) - 1) % n
    row = rng.integers(0, n, e)
    va = rng.standard_normal(e).astype(np.float32)
    vb = rng.standard_normal(e).astype(np.float32)
    x = jnp.asarray(rng.standard_normal((n, 2 * f)).astype(np.float32))

    D0 = dual_propagator(row, col, va, vb, n, mode="mxu")
    ref = np.asarray(dual_spmm_stacked(D0, x))

    monkeypatch.setattr(scatter_mxu, "COL_SPLIT_MIN_COLS", 100)
    monkeypatch.setattr(scatter_mxu, "GATHER_FAST_ROWS", 64)
    monkeypatch.setattr(scatter_mxu, "COL_SPLIT_MIN_COVERAGE", 0.0)
    D1 = dual_propagator(row, col, va, vb, n, mode="mxu")
    assert D1.hot_ids is not None and D1.plan.hot_chunks > 0
    out = np.asarray(dual_spmm_stacked(D1, x))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

    g = jnp.asarray(rng.standard_normal(ref.shape).astype(np.float32))
    dx0 = jax.grad(lambda xx: (dual_spmm_stacked(D0, xx) * g).sum())(x)
    dx1 = jax.grad(lambda xx: (dual_spmm_stacked(D1, xx) * g).sum())(x)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx0),
                               rtol=1e-4, atol=1e-4)
