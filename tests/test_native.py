"""Native C++ tier: CSV parser + coalescer parity with pure Python."""
import os

import numpy as np
import pytest

from pytorch_geometric_signed_directed_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def test_parse_matches_python(tmp_path, lib_ok):
    lines = ["alice,bob,1.5", "bob,carol,-2", "alice,carol,3",
             "dave,alice,-0.5", "bob,alice,2"]
    p = tmp_path / "edges.csv"
    p.write_text("\n".join(lines) + "\n")
    rows, cols, w, n = native.parse_signed_csv(str(p))

    node_map = {}
    exp = []
    for line in lines:
        a, b, ww = line.split(",")
        for t in (a, b):
            if t not in node_map:
                node_map[t] = len(node_map)
        exp.append((node_map[a], node_map[b], float(ww)))
    exp = np.asarray(exp)
    assert n == len(node_map)
    np.testing.assert_array_equal(rows, exp[:, 0])
    np.testing.assert_array_equal(cols, exp[:, 1])
    np.testing.assert_allclose(w, exp[:, 2])


def test_parse_real_bitcoin(lib_ok):
    path = "/root/reference/datasets/bitcoin_alpha.csv"
    if not os.path.isfile(path):
        pytest.skip("bundle missing")
    rows, cols, w, n = native.parse_signed_csv(path)
    assert n == 3783
    assert len(rows) == len(cols) == len(w)
    assert (w > 0).sum() > 20000 and (w < 0).sum() > 1000


def test_coalesce_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 50, 500)
    cols = rng.integers(0, 50, 500)
    w = rng.standard_normal(500).astype(np.float32)
    out = native.coalesce(rows, cols, w, 50)
    r2, c2, w2 = out

    import scipy.sparse as sp
    S = sp.coo_matrix((w, (rows, cols)), shape=(50, 50)).tocsr()
    S.sum_duplicates()
    S = S.tocoo()
    np.testing.assert_array_equal(r2, S.row)
    np.testing.assert_array_equal(c2, S.col)
    np.testing.assert_allclose(w2, S.data, rtol=1e-5)


def test_native_stable_argsort_matches_numpy():
    from pytorch_geometric_signed_directed_tpu import native

    rng = np.random.default_rng(3)
    # wide keys (composite row*num_cols+col) route to the radix path
    keys = rng.integers(0, 1 << 40, 2_000_000).astype(np.int64)
    got = native.stable_argsort(keys)
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))
    # duplicates: stability must match numpy exactly
    keys = (rng.integers(0, 7, 2_000_000) * (1 << 33)).astype(np.int64)
    got = native.stable_argsort(keys)
    np.testing.assert_array_equal(got, np.argsort(keys, kind="stable"))


def test_coalesce_multi_matches_numpy(lib_ok):
    rng = np.random.default_rng(5)
    n = 300_000
    keys = rng.integers(0, 40_000, n)
    v1 = rng.standard_normal(n)
    v2 = rng.random(n).astype(np.float32)
    out = native.coalesce_multi(keys, v1, v2)
    assert out is not None
    uniq, s1, s2 = out
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ks)) + 1])
    np.testing.assert_array_equal(uniq, ks[starts])
    np.testing.assert_allclose(s1, np.add.reduceat(v1[order], starts),
                               rtol=1e-9)
    np.testing.assert_allclose(
        s2, np.add.reduceat(v2[order].astype(np.float64), starts),
        rtol=1e-6)


def test_coalesce_edges_fused_branch(lib_ok, monkeypatch):
    """coalesce_edges' fused native route returns the same (row, col,
    sums) as its numpy pipeline."""
    from pytorch_geometric_signed_directed_tpu.ops import coalesce as co

    rng = np.random.default_rng(8)
    n = 50_000
    row = rng.integers(0, 300, n)
    col = rng.integers(0, 300, n)
    w1 = rng.standard_normal(n)
    w2 = rng.standard_normal(n).astype(np.float32)
    ref = co.coalesce_edges(row, col, w1, w2, num_cols=300)
    monkeypatch.setattr(co, "FUSED_COALESCE_MIN", 1)
    got = co.coalesce_edges(row, col, w1, w2, num_cols=300)
    for a, b in zip(got, ref):
        assert a.dtype == b.dtype
        # the native path accumulates float32 inputs in float64 and
        # rounds once (strictly more accurate than numpy's f32 reduceat),
        # so f32 sums with heavy cancellation differ at f32 ulp scale
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6)


def test_native_symmetrize_matches_numpy(lib_ok):
    """pgsd_symmetrize reproduces _symmetrize's numpy pipeline exactly
    (duplicates, self-loops, negative weights)."""
    rng = np.random.default_rng(11)
    n, e = 400, 6000
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    w = rng.standard_normal(e)
    row[:50] = col[:50]  # self loops to skip
    out = native.symmetrize(row, col, w, n)
    assert out is not None
    rr, cc, sym, theta, absv = out

    mask = row != col
    r = np.concatenate([row[mask], col[mask]])
    c = np.concatenate([col[mask], row[mask]])
    sym_a = np.concatenate([w[mask], w[mask]])
    th_a = np.concatenate([w[mask], -w[mask]])
    ab_a = np.concatenate([np.abs(w[mask])] * 2)
    key = r * n + c
    order = np.argsort(key, kind="stable")
    ks = key[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ks)) + 1])
    np.testing.assert_array_equal(rr, ks[starts] // n)
    np.testing.assert_array_equal(cc, ks[starts] % n)
    np.testing.assert_allclose(sym, np.add.reduceat(sym_a[order], starts),
                               atol=1e-12)
    np.testing.assert_allclose(theta, np.add.reduceat(th_a[order], starts),
                               atol=1e-12)
    np.testing.assert_allclose(absv, np.add.reduceat(ab_a[order], starts),
                               atol=1e-12)


@pytest.mark.parametrize("signed,absolute_degree,deg_mode",
                         [(False, True, 0), (True, True, 1),
                          (True, False, 2)])
def test_native_magnetic_sym_lap_matches_core(lib_ok, signed,
                                              absolute_degree, deg_mode):
    """pgsd_magnetic_sym_lap == _laplacian_core(normalization='sym') for
    all three degree modes (the giant-path fusion used past 2^20 edges)."""
    from pytorch_geometric_signed_directed_tpu.spectral.magnetic import (
        _laplacian_core)

    rng = np.random.default_rng(12)
    n, e = 300, 5000
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = rng.standard_normal(e) if signed else rng.uniform(0.1, 2.0, e)
    ref_ei, ref_re, ref_im = _laplacian_core(
        ei, w, "sym", n, q=0.2, return_lambda_max=False, signed=signed,
        absolute_degree=absolute_degree)
    out = native.magnetic_sym_lap(ei[0], ei[1],
                                  np.asarray(w, np.float64), n, 0.2,
                                  deg_mode)
    assert out is not None
    orow, ocol, wre, wim = out
    np.testing.assert_array_equal(np.stack([orow, ocol]), ref_ei)
    np.testing.assert_allclose(wre, ref_re, atol=1e-12)
    np.testing.assert_allclose(wim, ref_im, atol=1e-12)


@pytest.mark.parametrize("grouped,sort_input,window,chunk",
                         [(False, False, 128, 1024),
                          (False, True, 512, 2048),
                          (True, False, 128, 1024),
                          (True, True, 512, 2048)])
def test_native_plan_layout_bit_exact(lib_ok, grouped, sort_input,
                                      window, chunk):
    """native.plan_layout == the numpy _build_plan_host pipeline,
    bit-for-bit (perm/lr/gr/win/visited/hot_chunks), grouped and
    ungrouped, sorted and unsorted inputs."""
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)

    rng = np.random.default_rng(7)
    n, e = 2000, 30000
    row = rng.integers(0, n, e).astype(np.int64)
    if sort_input:
        row = np.sort(row)
    grp = (rng.random(e) < 0.3).astype(np.int8) if grouped else None

    # numpy reference: run _build_plan_host with the native path disabled
    orig = native.plan_layout
    native.plan_layout = lambda *a, **k: None
    try:
        hN = sm._build_plan_host(row, n, chunk=chunk, window=window,
                                 group=grp)
    finally:
        native.plan_layout = orig

    hC = native.plan_layout(row, n, window, chunk, grp)
    assert hC is not None
    for k in ("perm", "lr", "gr", "win"):
        np.testing.assert_array_equal(hN[k], hC[k], err_msg=k)
    np.testing.assert_array_equal(hN["visited"], hC["visited"])
    assert hN["hot_chunks"] == hC["hot_chunks"]
    assert hN["num_windows"] == hC["num_windows"]


def test_native_permute_gather_matches_numpy(lib_ok):
    from pytorch_geometric_signed_directed_tpu.ops.pallas import (
        scatter_mxu as sm)

    rng = np.random.default_rng(8)
    e, total = 5000, 6144
    perm = np.full(total, -1, np.int64)
    idx = rng.choice(total, e, replace=False)
    perm[idx] = rng.permutation(e)
    for dtype in (np.int32, np.float32, np.int64, np.float64):
        src = (rng.standard_normal(e) * 100).astype(dtype)
        ref, = sm.permute_edge_data(perm, src)
        out = native.permute_gather(perm, src)
        assert out is not None
        np.testing.assert_array_equal(ref, out)
