"""On-device numerical parity sweep: every kernel tier on the REAL TPU.

The CPU test suite (tests/, 8-device virtual mesh) proves semantics; this
script proves the same numbers come out of the actual chip — Pallas
lowering, Mosaic layouts, and the XLA TPU backend included.  Each check
builds a small-but-nontrivial graph, runs the public API on the default
(TPU) backend at HIGHEST matmul precision, and compares against a
scipy/numpy float64 ground truth.

Run: python scripts/tpu_parity_check.py       (~2-4 min incl. compiles)
Exit code 0 = every check under tolerance; each line reports max |err|.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.ops.spmm import (
    dual_propagator, dual_spmm, make_propagator, set_matmul_precision)
from pytorch_geometric_signed_directed_tpu.ops.segment import segment_softmax
from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu
from pytorch_geometric_signed_directed_tpu.spectral import (
    magnet_propagators, magnetic_template, template_dual_apply)

FAILS = []


def check(name, got, want, atol=5e-5):
    err = float(np.abs(np.asarray(got, np.float64) - want).max())
    ok = err <= atol
    print(f"{'ok  ' if ok else 'FAIL'} {name}: max|err|={err:.2e}",
          flush=True)
    if not ok:
        FAILS.append(name)


def rand_graph(rng, n, e):
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    return row, col, w


def dense_of(row, col, w, n):
    A = np.zeros((n, n))
    np.add.at(A, (row, col), w)
    return A


def main():
    print("backend:", jax.default_backend(), flush=True)
    set_matmul_precision("highest")
    rng = np.random.default_rng(0)

    # --- propagator tiers ---------------------------------------------
    n, e = 700, 5000
    row, col, w = rand_graph(rng, n, e)
    A = dense_of(row, col, w, n)
    x = rng.standard_normal((n, 19)).astype(np.float32)  # non-lane-aligned
    want = A @ x
    for mode in ("dense", "segment", "mxu", "bsr"):
        P = make_propagator(row, col, w, n, mode=mode)
        check(f"spmm tier={mode}", P(jnp.asarray(x)), want)
        g = jax.grad(lambda v: jnp.sum(jnp.sin(P(v))))(jnp.asarray(x))
        check(f"spmm grad tier={mode}", g, A.T @ np.cos(A @ x))

    # --- streamed + col-split scatter ---------------------------------
    saved = (scatter_mxu.STREAM_THRESHOLD_EDGES,
             scatter_mxu.STREAM_BLOCK_EDGES,
             scatter_mxu.COL_SPLIT_MIN_COLS,
             scatter_mxu.GATHER_FAST_ROWS,
             scatter_mxu.COL_SPLIT_MIN_COVERAGE)
    try:
        scatter_mxu.STREAM_THRESHOLD_EDGES = 1024
        scatter_mxu.STREAM_BLOCK_EDGES = 2048
        P = make_propagator(row, col, w, n, mode="mxu")
        assert P.mxu.stream is not None
        check("spmm streamed", P(jnp.asarray(x)), want)
        scatter_mxu.COL_SPLIT_MIN_COLS = 100
        scatter_mxu.GATHER_FAST_ROWS = 64
        scatter_mxu.COL_SPLIT_MIN_COVERAGE = 0.0
        P = make_propagator(row, col, w, n, mode="mxu")
        assert P.mxu.hot_ids is not None
        check("spmm streamed+col-split", P(jnp.asarray(x)), want)
        scatter_mxu.STREAM_THRESHOLD_EDGES = saved[0]
        scatter_mxu.STREAM_BLOCK_EDGES = saved[1]
        P = make_propagator(row, col, w, n, mode="mxu")
        assert P.mxu.plan is not None and P.mxu.hot_ids is not None
        check("spmm flat col-split", P(jnp.asarray(x)), want)
        g = jax.grad(lambda v: jnp.sum(jnp.sin(P(v))))(jnp.asarray(x))
        check("spmm flat col-split grad", g, A.T @ np.cos(A @ x))
    finally:
        (scatter_mxu.STREAM_THRESHOLD_EDGES, scatter_mxu.STREAM_BLOCK_EDGES,
         scatter_mxu.COL_SPLIT_MIN_COLS, scatter_mxu.GATHER_FAST_ROWS,
         scatter_mxu.COL_SPLIT_MIN_COVERAGE) = saved

    # --- fused dual ----------------------------------------------------
    wb = rng.random(e).astype(np.float32)
    # dual_propagator requires coalesced shared structure
    key = row.astype(np.int64) * n + col
    uniq = np.unique(key)
    r2, c2 = uniq // n, uniq % n
    wa2 = np.zeros(len(uniq), np.float32)
    wb2 = np.zeros(len(uniq), np.float32)
    np.add.at(wa2, np.searchsorted(uniq, key), w)
    np.add.at(wb2, np.searchsorted(uniq, key), wb)
    Aa = dense_of(r2, c2, wa2, n)
    Ab = dense_of(r2, c2, wb2, n)
    D = dual_propagator(r2, c2, wa2, wb2, n, mode="mxu")
    xb = rng.standard_normal((n, 19)).astype(np.float32)
    ya, yb2 = dual_spmm(D, jnp.asarray(x), jnp.asarray(xb))
    check("dual_spmm a", ya, Aa @ x)
    check("dual_spmm b", yb2, Ab @ xb)

    # --- magnetic pair + trainable q ------------------------------------
    # the magnetic Laplacian strips self-loops
    # (reference get_magnetic_Laplacian.py; spectral._remove_self_loops),
    # so the dense ground truth must too
    keep = row != col
    row, col, w = row[keep], col[keep], w[keep]
    A = dense_of(row, col, w, n)
    ei = np.vstack([row, col])
    q = 0.2
    As = (A + A.T) / 2.0
    theta = 2 * np.pi * q * (A - A.T)
    deg = As.sum(1)
    dinv = np.where(deg > 0, deg ** -0.5, 0.0)
    H = dinv[:, None] * As * dinv[None, :] * np.exp(1j * theta)
    Lhat = (-H).T          # 2L/2 - I with L = I - H
    pair = magnet_propagators(ei, w, q=q, num_nodes=n, mode="mxu")
    check("magnet re", pair.re(jnp.asarray(x)), Lhat.real @ x)
    check("magnet im", pair.im(jnp.asarray(x)), Lhat.imag @ x)

    tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
    x2 = jnp.asarray(np.concatenate([x, x], axis=1))
    out = template_dual_apply(tmpl, q, x2)
    check("template fwd re", out[:, :19], Lhat.real @ x)
    check("template fwd im", out[:, 19:], Lhat.imag @ x)
    gsum = jnp.asarray(rng.standard_normal((n, 38)).astype(np.float32))

    def f(qv, v):
        return (template_dual_apply(tmpl, qv, v) * gsum).sum()

    dq, dx = jax.grad(f, argnums=(0, 1))(q, x2)
    eps = 1e-3
    fd = (float(f(q + eps, x2)) - float(f(q - eps, x2))) / (2 * eps)
    check("template dq vs finite-diff", np.asarray(dq), np.float64(fd),
          atol=max(5e-3 * abs(fd), 1e-3))

    # --- segment softmax (attention path) -------------------------------
    seg = np.sort(rng.integers(0, 50, 400)).astype(np.int32)
    logits = rng.standard_normal(400).astype(np.float32)
    got = segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 50)
    want_sm = np.zeros_like(logits, dtype=np.float64)
    for s in np.unique(seg):
        m = seg == s
        z = np.exp(logits[m].astype(np.float64)
                   - logits[m].astype(np.float64).max())
        want_sm[m] = z / z.sum()
    check("segment_softmax", got, want_sm, atol=1e-6)

    # --- scipy CSR cross-check on a bigger asymmetric graph -------------
    n2, e2 = 4000, 60000
    r3, c3, w3 = rand_graph(rng, n2, e2)
    S = sp.coo_matrix((w3.astype(np.float64), (r3, c3)),
                      shape=(n2, n2)).tocsr()
    x3 = rng.standard_normal((n2, 33)).astype(np.float32)
    P = make_propagator(r3, c3, w3, n2, mode="mxu")
    check("spmm mxu vs scipy (N=4000)", P(jnp.asarray(x3)), S @ x3,
          atol=2e-4)

    # --- round 5: fused SGCN union-edge-set dual ------------------------
    from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
        sgcn_dual_propagator, split_signed_edges)
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_spmm_stacked)

    edges_s = np.column_stack([
        rng.integers(0, 600, 3000), rng.integers(0, 600, 3000),
        rng.choice([-1, 1], 3000)]).astype(np.int64)
    pos, neg = split_signed_edges(edges_s)
    Dsg = sgcn_dual_propagator(pos, neg, 600, mode="mxu")
    xa = rng.standard_normal((600, 16)).astype(np.float32)
    xb = rng.standard_normal((600, 16)).astype(np.float32)
    y = dual_spmm_stacked(Dsg, jnp.asarray(np.concatenate([xa, xb], 1)))

    def mean_mat(ei, nn_):
        r, c = ei[1], ei[0]
        cnt = np.bincount(r, minlength=nn_).astype(np.float64)
        cnt[cnt == 0] = 1
        return sp.coo_matrix((1.0 / cnt[r], (r, c)),
                             shape=(nn_, nn_)).tocsr()

    check("fused sgcn dual (pos lane)", np.asarray(y)[:, :16],
          mean_mat(pos, 600) @ xa.astype(np.float64))
    check("fused sgcn dual (neg lane)", np.asarray(y)[:, 16:],
          mean_mat(neg, 600) @ xb.astype(np.float64))

    # --- round 5: motif-stack fused attend (fwd + custom-VJP grads) -----
    import flax.linen as fnn
    from pytorch_geometric_signed_directed_tpu.nn.signed.motif_stack \
        import build_motif_stack, motif_attend
    from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv \
        import attention_softmax_aggregate

    Gm, nm, fm = 5, 200, 8
    els = [np.vstack([rng.integers(0, nm, 300),
                      rng.integers(0, nm, 300)]) for _ in range(Gm)]
    ms = build_motif_stack(els, nm)
    GN = Gm * nm
    T = jnp.asarray(rng.standard_normal((GN, fm)), jnp.float32)
    a_s = jnp.asarray(rng.standard_normal(GN), jnp.float32)
    a_d = jnp.asarray(rng.standard_normal(GN), jnp.float32)

    def ref_attend(T_, a_s_, a_d_):
        srcm = jnp.minimum(ms.g.src, GN - 1)
        dstm = jnp.minimum(ms.g.dst, GN - 1)
        lg = fnn.leaky_relu(a_s_[srcm] + a_d_[dstm], 0.2)
        return attention_softmax_aggregate(ms.g, lg, T_[srcm])

    out_f = motif_attend(0.2, ms, T, a_s, a_d)
    check("motif_attend fwd", out_f, np.asarray(ref_attend(T, a_s, a_d),
                                                np.float64), atol=2e-5)
    wv = jnp.asarray(rng.standard_normal(out_f.shape), jnp.float32)
    gf = jax.grad(lambda *a: (motif_attend(0.2, ms, *a) * wv).sum(),
                  argnums=(0, 1, 2))(T, a_s, a_d)
    gr = jax.grad(lambda *a: (ref_attend(*a) * wv).sum(),
                  argnums=(0, 1, 2))(T, a_s, a_d)
    for (a, b, nm_) in zip(gf, gr, ("dT", "da_src", "da_dst")):
        check(f"motif_attend grad {nm_}", a, np.asarray(b, np.float64),
              atol=5e-5)

    # --- round 5: SNEA pair fusion + XLA backend flag -------------------
    from pytorch_geometric_signed_directed_tpu.nn.signed import snea_conv

    gA = snea_conv.build_attention_graph(
        [(np.vstack([rng.integers(0, 300, 1200),
                     rng.integers(0, 300, 1200)]), 0, True)], 300)
    eA = gA.src.shape[0]
    l1 = jnp.asarray(rng.standard_normal(eA), jnp.float32)
    l2 = jnp.asarray(rng.standard_normal(eA), jnp.float32)
    m1 = jnp.asarray(rng.standard_normal((eA, 8)), jnp.float32)
    m2 = jnp.asarray(rng.standard_normal((eA, 8)), jnp.float32)
    o1, o2 = snea_conv.attention_softmax_aggregate_pair(gA, l1, m1, l2,
                                                        m2)
    r1 = snea_conv.attention_softmax_aggregate(gA, l1, m1)
    r2 = snea_conv.attention_softmax_aggregate(gA, l2, m2)
    check("snea pair fusion (lane 1)", o1, np.asarray(r1, np.float64),
          atol=2e-5)
    check("snea pair fusion (lane 2)", o2, np.asarray(r2, np.float64),
          atol=2e-5)
    snea_conv.AGGREGATE_BACKEND = "xla"
    try:
        x1 = snea_conv.attention_softmax_aggregate(gA, l1, m1)
    finally:
        snea_conv.AGGREGATE_BACKEND = "mxu"
    check("snea xla-backend flag", x1, np.asarray(r1, np.float64),
          atol=2e-5)

    # --- round 5: fused adjacency dual for the imbalance volumes --------
    from pytorch_geometric_signed_directed_tpu.graph import (
        adj_dual_propagator)
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        dual_spmm_stacked)

    nD = 700
    eiD = np.vstack([rng.integers(0, nD, 5000), rng.integers(0, nD, 5000)])
    wD = rng.standard_normal(5000).astype(np.float32)
    Pd = jnp.asarray(rng.standard_normal((nD, 5)), jnp.float32)
    D = adj_dual_propagator(eiD, wD, nD)
    stacked = dual_spmm_stacked(D, jnp.concatenate([Pd, Pd], axis=1))
    import scipy.sparse as _sp
    A64 = _sp.coo_matrix((wD.astype(np.float64), (eiD[0], eiD[1])),
                         shape=(nD, nD)).tocsr()
    P64 = np.asarray(Pd, np.float64)
    check("adj dual (A side)", stacked[:, :5], A64 @ P64, atol=2e-5)
    check("adj dual (A^T side)", stacked[:, 5:], A64.T @ P64, atol=2e-5)

    print(f"\n{len(FAILS)} failures" if FAILS else "\nall parity checks ok",
          flush=True)
    sys.exit(1 if FAILS else 0)


if __name__ == "__main__":
    main()
