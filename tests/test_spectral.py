"""Spectral preprocessing parity vs independent dense-numpy derivations."""
import numpy as np
import pytest
import scipy.sparse as sp

from pytorch_geometric_signed_directed_tpu.spectral import (
    appr_directed_adj,
    cal_fast_appr,
    create_spectral_features,
    hermitian_features,
    magnet_propagators,
    magnetic_laplacian,
    magnetic_signed_laplacian,
    magnetic_template,
    second_directed_adj,
    signed_laplacian_eig_features,
    spectral_adjacency_reg_features,
    template_propagators,
)


def random_digraph(n=30, e=120, seed=0, signed=False):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    keep = row != col
    row, col = row[keep], col[keep]
    # dedupe to keep the dense derivation simple
    key = np.unique(row * n + col)
    row, col = key // n, key % n
    w = rng.uniform(0.5, 2.0, len(row))
    if signed:
        w *= rng.choice([-1.0, 1.0], len(row))
    return np.stack([row, col]), w


def dense_magnetic_laplacian(edge_index, w, n, q, normalization="sym",
                             signed=False, absolute_degree=True):
    """Independent dense derivation of the (signed) magnetic Laplacian."""
    A = np.zeros((n, n))
    A[edge_index[0], edge_index[1]] = w
    sym = (A + A.T) / 2
    theta = A - A.T
    phase = np.exp(1j * 2 * np.pi * q * theta)
    if not signed:
        deg = sym.sum(1)
    elif absolute_degree:
        deg = ((np.abs(A) + np.abs(A).T) / 2).sum(1)
    else:
        deg = np.abs(sym).sum(1)
    H = sym * phase
    if normalization is None:
        return np.diag(deg) - H
    dinv = np.where(deg > 0, deg ** -0.5, 0)
    return np.eye(n) - dinv[:, None] * H * dinv[None, :]


def assemble(ei, wre, wim, n):
    L = np.zeros((n, n), dtype=complex)
    np.add.at(L, (ei[0], ei[1]), wre + 1j * wim)
    return L


@pytest.mark.parametrize("normalization", [None, "sym"])
def test_magnetic_laplacian_matches_dense(normalization):
    n = 30
    ei, w = random_digraph(n)
    for q in (0.0, 0.1, 0.25):
        out = magnetic_laplacian(ei, w, normalization, n, q)
        L = assemble(out[0], out[1], out[2], n)
        np.testing.assert_allclose(
            L, dense_magnetic_laplacian(ei, w, n, q, normalization),
            atol=1e-10)


@pytest.mark.parametrize("absolute_degree", [True, False])
def test_magnetic_signed_laplacian_matches_dense(absolute_degree):
    n = 30
    ei, w = random_digraph(n, signed=True, seed=3)
    out = magnetic_signed_laplacian(ei, w, "sym", n, 0.2,
                                    absolute_degree=absolute_degree)
    L = assemble(out[0], out[1], out[2], n)
    np.testing.assert_allclose(
        L, dense_magnetic_laplacian(ei, w, n, 0.2, "sym", signed=True,
                                    absolute_degree=absolute_degree),
        atol=1e-10)


def test_lambda_max_is_largest_eig():
    n = 20
    ei, w = random_digraph(n, seed=5)
    _, _, _, lmax = magnetic_laplacian(ei, w, "sym", n, 0.25,
                                       return_lambda_max=True)
    L = dense_magnetic_laplacian(ei, w, n, 0.25, "sym")
    np.testing.assert_allclose(lmax, np.abs(np.linalg.eigvalsh(L)).max(),
                               rtol=1e-6)


def test_magnet_propagators_scaled():
    """Propagator pair == (2L/lambda - I)^T applied densely (lambda=2, sym).

    The conv applies L^T (the reference's flow setdefault is dead code —
    see spectral.magnetic.magnet_propagators); L_re is symmetric and L_im
    antisymmetric, so the imaginary operator is the negated Laplacian imag.
    """
    n = 25
    ei, w = random_digraph(n, seed=7)
    P_re, P_im = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="dense")
    L = dense_magnetic_laplacian(ei, w, n, 0.25, "sym")
    Lhat = L - np.eye(n)
    np.testing.assert_allclose(np.asarray(P_re.dense), Lhat.real, atol=1e-6)
    np.testing.assert_allclose(np.asarray(P_im.dense), Lhat.imag.T, atol=1e-6)


def test_mxu_singles_are_views_of_the_dual():
    """mode='mxu' standalone re/im operators (free views over the dual's
    scatter plan, ops.spmm.propagators_from_dual) match the dense tier for
    forward AND gradient."""
    import jax
    import jax.numpy as jnp

    n = 150
    ei, w = random_digraph(n, 900, seed=13)
    pair_m = magnet_propagators(ei, w, q=0.2, num_nodes=n, mode="mxu")
    pair_d = magnet_propagators(ei, w, q=0.2, num_nodes=n, mode="dense")
    assert pair_m.re.mode == "mxu" and pair_m.im.mode == "mxu"
    # shared plan: the view must not have rebuilt anything
    assert pair_m.re.mxu.plan is pair_m.dual.plan
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, 8)).astype(np.float32))
    for which in ("re", "im"):
        Pm, Pd = getattr(pair_m, which), getattr(pair_d, which)
        np.testing.assert_allclose(np.asarray(Pm(x)), np.asarray(Pd(x)),
                                   atol=1e-5)
        gm = jax.grad(lambda x: jnp.sum(jnp.sin(Pm(x))))(x)
        gd = jax.grad(lambda x: jnp.sum(jnp.sin(Pd(x))))(x)
        np.testing.assert_allclose(np.asarray(gm), np.asarray(gd),
                                   atol=1e-5)


def test_mxu_singles_streamed_views():
    """The view split also holds for streamed (giant-graph) duals."""
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        propagators_from_dual)

    n = 600
    ei, w = random_digraph(n, 4000, seed=17)
    saved = scatter_mxu.STREAM_THRESHOLD_EDGES
    scatter_mxu.STREAM_THRESHOLD_EDGES = 1024
    try:
        pair_m = magnet_propagators(ei, w, q=0.1, num_nodes=n, mode="mxu")
    finally:
        scatter_mxu.STREAM_THRESHOLD_EDGES = saved
    assert pair_m.dual.stream is not None
    assert pair_m.re.mxu.stream is pair_m.dual.stream
    pair_d = magnet_propagators(ei, w, q=0.1, num_nodes=n, mode="dense")
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((n, 4)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(pair_m.re(x)),
                               np.asarray(pair_d.re(x)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pair_m.im(x)),
                               np.asarray(pair_d.im(x)), atol=1e-5)
    # splitting a segment dual also works (COO views)
    pair_s = magnet_propagators(ei, w, q=0.1, num_nodes=n, mode="segment")
    P_re, P_im = propagators_from_dual(pair_s.dual)
    np.testing.assert_allclose(np.asarray(P_re(x)),
                               np.asarray(pair_d.re(x)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(P_im(x)),
                               np.asarray(pair_d.im(x)), atol=1e-5)


@pytest.mark.parametrize("mode", ["dense", "segment"])
def test_template_matches_static(mode):
    n = 25
    ei, w = random_digraph(n, seed=9)
    tmpl = magnetic_template(ei, w, n, mode=mode)
    for q in (0.05, 0.25):
        P_re, P_im = template_propagators(tmpl, q)
        S_re, S_im = magnet_propagators(ei, w, q=q, num_nodes=n, mode="dense")
        x = np.random.default_rng(0).standard_normal((n, 4)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(P_re(x)), np.asarray(S_re(x)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(P_im(x)), np.asarray(S_im(x)),
                                   atol=1e-5)


class TestAppr:
    def test_appr_adjacency_symmetric(self):
        ei, w = random_digraph(20, 60, seed=11)
        out_ei, out_w = appr_directed_adj(0.1, ei, 20)
        A = np.zeros((20, 20))
        A[out_ei[0], out_ei[1]] = out_w
        np.testing.assert_allclose(A, A.T, atol=1e-6)

    def test_second_adj_symmetric(self):
        ei, w = random_digraph(20, 60, seed=13)
        out_ei, out_w = second_directed_adj(ei, 20)
        A = np.zeros((20, 20))
        A[out_ei[0], out_ei[1]] = out_w
        np.testing.assert_allclose(A, A.T, atol=1e-6)

    def test_cal_fast_appr_runs(self):
        ei, w = random_digraph(20, 60, seed=15)
        out_ei, out_w = cal_fast_appr(0.1, ei, 20)
        assert out_ei.shape[0] == 2 and len(out_w) == out_ei.shape[1]
        assert np.isfinite(out_w).all()

    def test_fast_appr_power_vs_dense_math(self):
        """fast_appr_power against a dense from-the-definition evaluation
        of the same lazy-teleport PageRank + pi-symmetrization."""
        from pytorch_geometric_signed_directed_tpu.spectral.appr import (
            fast_appr_power,
        )

        rng = np.random.default_rng(21)
        n, alpha = 24, 0.15
        A = (rng.random((n, n)) < 0.12).astype(np.float64)
        np.fill_diagonal(A, 0)
        A[3] = 0.0  # a dangling node
        A_sp = sp.csr_matrix(A)

        # dense evaluation, straight from the definition
        deg = A.sum(1)
        P = np.divide(A, deg[:, None], out=np.zeros_like(A),
                      where=deg[:, None] > 0)
        restart = np.full(n, 1.0 / (n * (1 + alpha)))
        z = np.where(deg > 0, alpha * (1 + alpha),
                     alpha * (1 + alpha) + (1 - alpha) / (1 + alpha))
        pi = restart.copy()
        for _ in range(500):
            pi = (1 - alpha) * P.T @ pi + (z @ pi) * restart
        pi = pi / pi.sum()
        M = np.sqrt(pi)[:, None] * P / np.sqrt(pi)[None, :]
        L_expect = (M + M.T) / 2

        L, pi_got = fast_appr_power(A_sp, alpha=alpha, tol=1e-12,
                                    max_iter=1000)
        np.testing.assert_allclose(pi_got, pi, atol=1e-9)
        np.testing.assert_allclose(L.toarray(), L_expect, atol=1e-9)


class TestFeatures:
    def test_create_spectral_features_shape(self):
        rng = np.random.default_rng(0)
        pos = rng.integers(0, 40, (2, 100))
        neg = rng.integers(0, 40, (2, 40))
        x = create_spectral_features(pos, neg, 40, dim=8)
        assert x.shape == (40, 8)
        assert np.isfinite(x).all()

    def test_hermitian_features(self):
        ei, w = random_digraph(30, seed=17)
        A = sp.coo_matrix((w, (ei[0], ei[1])), shape=(30, 30)).tocsr()
        x = hermitian_features(A, k=2)
        assert x.shape == (30, 4)
        # StandardScaler output: zero mean per column
        np.testing.assert_allclose(x.mean(0), 0, atol=1e-5)

    def test_signed_features(self):
        rng = np.random.default_rng(1)
        d = rng.integers(0, 25, (2, 150))
        A_p = sp.coo_matrix((np.ones(150), (d[0], d[1])), shape=(25, 25))
        d2 = rng.integers(0, 25, (2, 50))
        A_n = sp.coo_matrix((np.ones(50), (d2[0], d2[1])), shape=(25, 25))
        x1 = signed_laplacian_eig_features(A_p.tocsr(), A_n.tocsr(), k=3)
        assert x1.shape == (25, 3)
        for norm in (None, "sym", "sym_sep"):
            x2 = spectral_adjacency_reg_features(A_p.tocsr(), A_n.tocsr(),
                                                 k=3, normalization=norm)
            assert x2.shape == (25, 3)
            assert np.isfinite(x2).all()


class TestMxuTemplate:
    """Trainable-q fast path: frozen mxu scatter plan, traced edge values."""

    def _graph(self, n=300, e=2500, seed=5):
        rng = np.random.default_rng(seed)
        ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
        w = rng.random(e).astype(np.float32)
        return ei, w

    def test_template_mxu_matches_segment(self):
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_propagators)

        n = 300
        ei, w = self._graph(n)
        t_seg = magnetic_template(ei, w, num_nodes=n, mode="segment")
        t_mxu = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        x = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((n, 8)).astype(np.float32))
        for q in (0.05, 0.2):
            P_re_s, P_im_s = template_propagators(t_seg, q)
            P_re_m, P_im_m = jax.jit(template_propagators,
                                     static_argnums=())(t_mxu, q)
            np.testing.assert_allclose(np.asarray(P_re_m(x)),
                                       np.asarray(P_re_s(x)),
                                       rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(P_im_m(x)),
                                       np.asarray(P_im_s(x)),
                                       rtol=1e-4, atol=1e-5)

    def test_template_dual_matches_singles_and_q_grad(self):
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.ops.spmm import (
            dual_spmm_stacked_trainable)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_dual, template_propagators)

        n = 256
        ei, w = self._graph(n, seed=7)
        tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        x = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((n, 8)).astype(np.float32))

        def f(q):
            D = template_dual(tmpl, q)
            out = dual_spmm_stacked_trainable(
                D, jnp.concatenate([x, x], axis=1))
            return out[:, :8], out[:, 8:]

        ya, yb = jax.jit(f)(0.1)
        P_re, P_im = template_propagators(tmpl, 0.1)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(P_re(x)),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(P_im(x)),
                                   rtol=1e-4, atol=1e-5)

        # gradient w.r.t. q flows through the plan-order values and the
        # transposed-plan backward; check against finite differences
        def loss(q):
            ya, yb = f(q)
            return (ya ** 2).sum() + (yb ** 2).sum()

        g = float(jax.grad(loss)(0.1))
        eps = 1e-3
        fd = (float(loss(0.1 + eps)) - float(loss(0.1 - eps))) / (2 * eps)
        assert abs(g - fd) / (abs(fd) + 1e-6) < 2e-2, (g, fd)

    def test_template_dual_apply_fused_vjp(self):
        """The fused custom-VJP apply (in-kernel SDDMM dq) matches both the
        generic value-cotangent path and finite differences."""
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.ops.spmm import (
            dual_spmm_stacked_trainable)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_dual, template_dual_apply)

        n = 256
        ei, w = self._graph(n, seed=11)
        tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))

        def f_fused(q, x):
            return (template_dual_apply(tmpl, q, x) * g_out).sum()

        def f_generic(q, x):
            D = template_dual(tmpl, q)
            return (dual_spmm_stacked_trainable(D, x) * g_out).sum()

        q0 = 0.13
        va = float(f_fused(q0, x))
        vb = float(f_generic(q0, x))
        np.testing.assert_allclose(va, vb, rtol=1e-5)

        dq_a, dx_a = jax.jit(jax.grad(f_fused, argnums=(0, 1)))(q0, x)
        dq_b, dx_b = jax.jit(jax.grad(f_generic, argnums=(0, 1)))(q0, x)
        np.testing.assert_allclose(np.asarray(dx_a), np.asarray(dx_b),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(dq_a), float(dq_b),
                                   rtol=1e-3, atol=1e-5)
        eps = 1e-3
        fd = (float(f_fused(q0 + eps, x))
              - float(f_fused(q0 - eps, x))) / (2 * eps)
        assert abs(float(dq_a) - fd) / (abs(fd) + 1e-6) < 2e-2, (dq_a, fd)

    def test_template_dual_apply_fused_vjp_wide(self):
        """Wide features (2F > 128 lanes): the fused backward's two-dot
        fallback branch matches the generic value-cotangent path."""
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.ops.spmm import (
            dual_spmm_stacked_trainable)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_dual, template_dual_apply)

        n = 256
        ei, w = self._graph(n, seed=12)
        tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        rng = np.random.default_rng(6)
        f2 = 144  # fa = 72 per lane half -> exceeds the 128-lane fused dot
        x = jnp.asarray(rng.standard_normal((n, f2)).astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal((n, f2)).astype(np.float32))

        def f_fused(q, x):
            return (template_dual_apply(tmpl, q, x) * g_out).sum()

        def f_generic(q, x):
            D = template_dual(tmpl, q)
            return (dual_spmm_stacked_trainable(D, x) * g_out).sum()

        q0 = 0.21
        np.testing.assert_allclose(float(f_fused(q0, x)),
                                   float(f_generic(q0, x)), rtol=1e-5)
        dq_a, dx_a = jax.jit(jax.grad(f_fused, argnums=(0, 1)))(q0, x)
        dq_b, dx_b = jax.jit(jax.grad(f_generic, argnums=(0, 1)))(q0, x)
        np.testing.assert_allclose(np.asarray(dx_a), np.asarray(dx_b),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(dq_a), float(dq_b),
                                   rtol=1e-3, atol=1e-5)

    @pytest.mark.slow
    def test_trainable_q_magnet_model_mxu(self):
        import jax
        import jax.numpy as jnp
        import optax
        from pytorch_geometric_signed_directed_tpu.nn import (
            MagNet_node_classification)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template)

        n = 200
        ei, w = self._graph(n, 1500, seed=9)
        tmpl = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        x = jnp.asarray(np.random.default_rng(2)
                        .standard_normal((n, 4)).astype(np.float32))
        y = jnp.asarray(np.random.default_rng(3).integers(0, 3, n))
        model = MagNet_node_classification(
            num_features=4, hidden=8, K=2, label_dim=3, trainable_q=True,
            q=0.2, activation=True)
        params = model.init(jax.random.PRNGKey(0), x, x, tmpl)
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            def lf(pp):
                logp = model.apply(pp, x, x, tmpl)
                return -jnp.mean(logp[jnp.arange(n), y])

            loss, g = jax.value_and_grad(lf)(p)
            u, o = tx.update(g, o)
            return optax.apply_updates(p, u), o, loss

        losses = []
        for _ in range(20):
            params, opt, loss = step(params, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0]
        q_after = float(jax.tree.leaves(
            {k: v for k, v in jax.tree_util.tree_flatten_with_path(params)[0]
             if "'q'" in str(k)}[0][1][0]) if False else
            params["params"]["MagNetConv_0"]["q"][0])
        assert 0.0 <= q_after <= 0.25

    @pytest.mark.slow
    def test_template_dual_apply_col_split(self):
        """Trainable q on col-split templates (flat AND streamed): the
        sectioned fused backward matches the unsplit template exactly."""
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.ops.pallas import (
            scatter_mxu)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_dual_apply)

        rng = np.random.default_rng(23)
        n, e = 512, 6000
        # zipf columns so the hot table covers real mass
        ei = np.vstack([rng.integers(0, n, e),
                        (rng.zipf(1.3, e) - 1) % n])
        w = rng.random(e).astype(np.float32)
        tmpl_ref = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        assert tmpl_ref.hot_ids is None
        x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        q0 = 0.19

        def f(t):
            return lambda q, x: (template_dual_apply(t, q, x) * g_out).sum()

        v_ref = float(f(tmpl_ref)(q0, x))
        dq_ref, dx_ref = jax.grad(f(tmpl_ref), argnums=(0, 1))(q0, x)

        saved = (scatter_mxu.COL_SPLIT_MIN_COLS,
                 scatter_mxu.GATHER_FAST_ROWS,
                 scatter_mxu.COL_SPLIT_MIN_COVERAGE,
                 scatter_mxu.STREAM_THRESHOLD_EDGES,
                 scatter_mxu.STREAM_BLOCK_EDGES)
        try:
            scatter_mxu.COL_SPLIT_MIN_COLS = 100
            scatter_mxu.GATHER_FAST_ROWS = 64
            scatter_mxu.COL_SPLIT_MIN_COVERAGE = 0.0
            for streamed in (False, True):
                if streamed:
                    scatter_mxu.STREAM_THRESHOLD_EDGES = 1024
                    scatter_mxu.STREAM_BLOCK_EDGES = 2048
                t = magnetic_template(ei, w, num_nodes=n, mode="mxu")
                assert t.hot_ids is not None
                assert (t.stream is not None) == streamed
                if streamed:
                    assert t.transposed.stream.hot_blocks > 0
                else:
                    assert t.transposed.plan.hot_chunks > 0
                np.testing.assert_allclose(float(f(t)(q0, x)), v_ref,
                                           rtol=1e-5)
                dq, dx = jax.jit(jax.grad(f(t), argnums=(0, 1)))(q0, x)
                np.testing.assert_allclose(np.asarray(dx),
                                           np.asarray(dx_ref),
                                           rtol=1e-4, atol=1e-5)
                np.testing.assert_allclose(float(dq), float(dq_ref),
                                           rtol=1e-3, atol=1e-6)
        finally:
            (scatter_mxu.COL_SPLIT_MIN_COLS, scatter_mxu.GATHER_FAST_ROWS,
             scatter_mxu.COL_SPLIT_MIN_COVERAGE,
             scatter_mxu.STREAM_THRESHOLD_EDGES,
             scatter_mxu.STREAM_BLOCK_EDGES) = saved

    @pytest.mark.slow
    def test_template_dual_apply_streamed(self):
        """Streamed (giant-graph) trainable-q: the blocked fused backward
        matches the flat plan's forward, dx, and dq exactly."""
        import jax
        import jax.numpy as jnp
        from pytorch_geometric_signed_directed_tpu.ops.pallas import (
            scatter_mxu)
        from pytorch_geometric_signed_directed_tpu.spectral import (
            magnetic_template, template_dual_apply)

        n = 600
        ei, w = self._graph(n, 5000, seed=21)
        tmpl_flat = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        saved = scatter_mxu.STREAM_THRESHOLD_EDGES
        scatter_mxu.STREAM_THRESHOLD_EDGES = 1024
        try:
            tmpl_s = magnetic_template(ei, w, num_nodes=n, mode="mxu")
        finally:
            scatter_mxu.STREAM_THRESHOLD_EDGES = saved
        assert tmpl_s.stream is not None and tmpl_s.transposed.stream \
            is not None
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        g_out = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
        q0 = 0.17

        def make(t):
            return lambda q, x: (template_dual_apply(t, q, x) * g_out).sum()

        f_flat, f_s = make(tmpl_flat), make(tmpl_s)
        np.testing.assert_allclose(float(f_s(q0, x)), float(f_flat(q0, x)),
                                   rtol=1e-5)
        dq_f, dx_f = jax.grad(f_flat, argnums=(0, 1))(q0, x)
        dq_s, dx_s = jax.jit(jax.grad(f_s, argnums=(0, 1)))(q0, x)
        np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_f),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(dq_s), float(dq_f),
                                   rtol=1e-3, atol=1e-5)
        eps = 1e-3
        fd = (float(f_s(q0 + eps, x)) - float(f_s(q0 - eps, x))) / (2 * eps)
        assert abs(float(dq_s) - fd) / (abs(fd) + 1e-6) < 2e-2, (dq_s, fd)
