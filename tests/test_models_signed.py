"""Signed model family: SGCN/SNEA/SiGAT/SDGNN embed + sklearn eval,
SSSNET clustering. Mirrors reference test/signed_test.py."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pytorch_geometric_signed_directed_tpu.data import SSBM, SignedData
from pytorch_geometric_signed_directed_tpu.graph import rw_norm_propagator
from pytorch_geometric_signed_directed_tpu.nn import (
    SGCN,
    SNEA,
    SDGNN,
    SiGAT,
    SSSNET_link_prediction,
    SSSNET_node_clustering,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
    prepare_sgcn_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.snea import (
    prepare_snea_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
    prepare_sigat_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
    prepare_sdgnn_inputs,
)
from pytorch_geometric_signed_directed_tpu.utils import (
    Prob_Balanced_Normalized_Loss,
    Prob_Balanced_Ratio_Loss,
    Unhappy_Ratio,
    link_sign_prediction_logistic_function,
    negative_sampling,
    structured_negative_sampling,
    triplet_loss_node_classification,
)


def mock_signed_edges(n=60, seed=0):
    (A_p, A_n), labels = SSBM(n, 2, 0.3, 0.1, size_ratio=1,
                              rng=np.random.default_rng(seed))
    d = SignedData(A=(A_p, A_n), y=labels)
    ei = d.edge_index
    w = d.edge_weight
    edge_index_s = np.concatenate(
        [ei.T, np.sign(w)[:, None].astype(np.int64)], axis=1)
    return d, edge_index_s


def _embedding_model_harness(model_fn, prep, loss_args_fn, n=60, steps=15):
    """Build model, train a few steps on its own loss, sklearn-evaluate."""
    d, edge_index_s = mock_signed_edges(n)
    inputs = prep(n, edge_index_s)
    pos_ei, neg_ei = inputs[0], inputs[1]
    model = model_fn(inputs)

    fwd_args, make_loss_args = loss_args_fn(inputs)
    rng = np.random.default_rng(0)
    # init through the loss so sampling-loss heads get parameters too
    params = model.init(jax.random.PRNGKey(0), *make_loss_args(rng),
                        method=type(model).loss)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    loss_jit = None
    losses = []
    for _ in range(steps):
        largs = make_loss_args(rng)
        if loss_jit is None:
            loss_jit = jax.jit(
                lambda p, *a: jax.value_and_grad(
                    lambda pp: model.apply(pp, *a, method=type(model).loss)
                )(p))
        (loss, grads) = loss_jit(params, *largs)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    z = np.asarray(model.apply(params, *fwd_args))
    assert z.shape[0] == n and np.isfinite(z).all()

    # sklearn link-sign eval end-to-end (reference signed_test.py:90-169)
    edges = np.concatenate([pos_ei.T, neg_ei.T])
    y = np.concatenate([np.ones(pos_ei.shape[1], int),
                        np.zeros(neg_ei.shape[1], int)])
    perm = np.random.default_rng(1).permutation(len(y))
    edges, y = edges[perm], y[perm]
    cut = int(0.8 * len(y))
    acc, f1, f1m, f1mi, auc = link_sign_prediction_logistic_function(
        z, edges[:cut], y[:cut], edges[cut:], y[cut:])
    for v in (acc, f1, f1m, f1mi, auc):
        assert 0 <= v <= 1
    return acc


class TestSGCN:
    @pytest.mark.slow
    def test_train_and_eval(self):
        n = 60

        def model_fn(inputs):
            return SGCN(node_num=n, in_dim=16, out_dim=16, layer_num=2,
                        init_emb=inputs[2])

        def loss_args(inputs):
            pos_ei, neg_ei, init_emb, P_pos, P_neg = inputs
            fwd = (P_pos, P_neg)

            def make(rng):
                both = np.concatenate([pos_ei, neg_ei], axis=1)
                none_ei = negative_sampling(both, n, rng=rng)
                pos_t = structured_negative_sampling(pos_ei, n, rng=rng)
                neg_t = structured_negative_sampling(neg_ei, n, rng=rng)
                return (P_pos, P_neg, pos_ei, neg_ei, none_ei,
                        pos_t, neg_t)
            return fwd, make

        acc = _embedding_model_harness(
            model_fn, lambda nn_, e: prepare_sgcn_inputs(nn_, e, in_dim=16),
            loss_args)
        assert acc > 0.5


class TestSNEA:
    @pytest.mark.slow
    def test_train_and_eval(self):
        n = 60

        def model_fn(inputs):
            return SNEA(node_num=n, in_dim=16, out_dim=16, layer_num=2,
                        init_emb=inputs[2])

        def loss_args(inputs):
            pos_ei, neg_ei, init_emb, graphs = inputs
            fwd = (graphs,)

            def make(rng):
                both = np.concatenate([pos_ei, neg_ei], axis=1)
                none_ei = negative_sampling(both, n, rng=rng)
                pos_t = structured_negative_sampling(pos_ei, n, rng=rng)
                neg_t = structured_negative_sampling(neg_ei, n, rng=rng)
                return (graphs, pos_ei, neg_ei, none_ei,
                        pos_t, neg_t)
            return fwd, make

        _embedding_model_harness(
            model_fn, lambda nn_, e: prepare_snea_inputs(nn_, e, in_dim=16),
            loss_args)


class TestSiGAT:
    @pytest.mark.slow
    def test_train_and_eval(self):
        n = 60

        def model_fn(inputs):
            return SiGAT(node_num=n, in_dim=16, out_dim=16,
                         init_emb=inputs[2])

        def loss_args(inputs):
            pos_ei, neg_ei, init_emb, graphs = inputs
            fwd = (graphs,)

            def make(rng):
                return (graphs, pos_ei, neg_ei)
            return fwd, make

        _embedding_model_harness(
            model_fn, lambda nn_, e: prepare_sigat_inputs(nn_, e, in_dim=16),
            loss_args, steps=10)

    def test_motif_count(self):
        d, edge_index_s = mock_signed_edges(40, seed=3)
        _, _, _, graphs = prepare_sigat_inputs(40, edge_index_s, in_dim=8)
        assert len(graphs) == 38


class TestSDGNN:
    @pytest.mark.slow
    def test_train_and_eval(self):
        n = 60

        def model_fn(inputs):
            return SDGNN(node_num=n, in_dim=16, out_dim=16, layer_num=2,
                         init_emb=inputs[2])

        def loss_args(inputs):
            pos_ei, neg_ei, init_emb, graphs, w_pos, w_neg = inputs
            fwd = (graphs,)

            def make(rng):
                return (graphs, pos_ei, neg_ei, w_pos, w_neg)
            return fwd, make

        _embedding_model_harness(
            model_fn,
            lambda nn_, e: prepare_sdgnn_inputs(nn_, e, in_dim=16),
            loss_args, steps=10)


class TestSSSNET:
    def _propagators(self, d, directed):
        d.separate_positive_negative()
        n = d.num_nodes
        P_p = rw_norm_propagator(d.edge_index_p, d.edge_weight_p, n,
                                 fill_value=0.5)
        P_n = rw_norm_propagator(d.edge_index_n, d.edge_weight_n, n,
                                 fill_value=0.0)
        if not directed:
            return P_p, P_n, None, None
        P_pt = rw_norm_propagator(d.edge_index_p[[1, 0]], d.edge_weight_p, n,
                                  fill_value=0.5)
        P_nt = rw_norm_propagator(d.edge_index_n[[1, 0]], d.edge_weight_n, n,
                                  fill_value=0.0)
        return P_p, P_n, P_pt, P_nt

    @pytest.mark.parametrize("directed", [False, True])
    def test_clustering(self, directed):
        d, _ = mock_signed_edges(50, seed=5)
        n = d.num_nodes
        x = np.random.default_rng(0).standard_normal((n, 4)).astype(np.float32)
        P_p, P_n, P_pt, P_nt = self._propagators(d, directed)
        model = SSSNET_node_clustering(nfeat=4, hidden=8, nclass=2,
                                       directed=directed)
        params = model.init(jax.random.PRNGKey(0), P_p, P_n, x, P_pt, P_nt)
        z, logp, pred, prob = model.apply(params, P_p, P_n, x, P_pt, P_nt)
        dim = 4 * 8 if directed else 2 * 8
        assert z.shape == (n, dim)
        assert logp.shape == (n, 2) and prob.shape == (n, 2)

        # self-supervised losses on the probabilities
        d.separate_positive_negative()
        pbnc = Prob_Balanced_Normalized_Loss(d.A_p.tocsr(), d.A_n.tocsr())
        pbrc = Prob_Balanced_Ratio_Loss(d.A_p.tocsr(), d.A_n.tocsr())
        ur = Unhappy_Ratio(d.A_p.tocsr(), d.A_n.tocsr())
        for loss in (pbnc(prob), pbrc(prob), ur(prob)):
            assert np.isfinite(float(loss))
        assert float(pbnc(prob)) >= 0
        tl = triplet_loss_node_classification(d.y, z, n_sample=100, thre=0.1)
        assert float(tl) >= 0

    def test_link_prediction(self):
        d, _ = mock_signed_edges(50, seed=7)
        n = d.num_nodes
        x = np.random.default_rng(0).standard_normal((n, 4)).astype(np.float32)
        P_p, P_n, _, _ = self._propagators(d, False)
        q_edges = jnp.asarray(d.edge_index.T[:20])
        model = SSSNET_link_prediction(nfeat=4, hidden=8, nclass=2)
        params = model.init(jax.random.PRNGKey(0), P_p, P_n, x, q_edges)
        out = model.apply(params, P_p, P_n, x, q_edges)
        assert out.shape == (20, 2)


def test_sdgnn_dual_sign_pair_uses_neg_weight():
    """A pair with both + and - edges keeps only the neg-mask triangle
    count (reference weight_dict overwrite semantics)."""
    from pytorch_geometric_signed_directed_tpu.nn.signed.motifs import (
        sdgnn_edge_lists)

    eis = np.array([
        [0, 1, 1], [0, 1, -1],   # dual-sign pair
        [0, 2, 1], [2, 1, 1],    # pos 2-path 0->2->1 (d1_1 for (0,1))
        [0, 3, -1], [3, 1, -1],  # neg 2-path (d1_4)
    ])
    _, tri = sdgnn_edge_lists(eis, 4)
    # neg mask counts d1_2+d1_3 (0 here) etc.; pos mask would count
    # d1_1=1 and d1_4... the key assertion: value equals the neg-mask
    # count alone, not pos+neg summed
    from pytorch_geometric_signed_directed_tpu.nn.signed.motifs import (
        _SDGNN_MASK_NEG)
    # compute neg-mask expectation by hand: d-counts for (0,1)
    # pos_out[0]={1,2}, pos_in[1]={0,2}, neg_out[0]={1,3}, neg_in[1]={0,3}
    d = {
        0: len({1, 2} & {0, 2}),   # d1_1 pos_out & pos_in = {2} -> 1
        1: len({1, 2} & {0, 3}),   # d1_2
        2: len({1, 3} & {0, 2}),   # d1_3
        3: len({1, 3} & {0, 3}),   # d1_4 = {3} -> 1
    }
    counts16 = np.zeros(16)
    counts16[0], counts16[1], counts16[2], counts16[3] = d[0], d[1], d[2], d[3]
    # remaining d2/d3/d4 computed implicitly by the motif code; just check
    # the pos-only contribution (mask index 0 weight 1 on d1_1=1) is absent
    val = tri[0, 1]
    naive_neg = np.dot(counts16, _SDGNN_MASK_NEG)
    # tri may include d2/d3/d4 neg-mask terms; it must NOT include the
    # pos-mask d1_1 term (which would add 1)
    assert val >= naive_neg
    # recompute full expectation via the tested-parity naive path
    from tests.test_motifs import naive_adj_lists
    _, tri_counts = naive_adj_lists(eis, 4)
    assert val == np.dot(tri_counts(0, 1), _SDGNN_MASK_NEG)


def test_attention_softmax_aggregate_matches_dense():
    """Plan-based softmax aggregation == per-destination dense softmax."""
    from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv import (
        attention_softmax_aggregate, build_attention_graph)

    rng = np.random.default_rng(0)
    n, e, f = 200, 1500, 8
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)])
    g = build_attention_graph([(ei, 0, False)], n)
    e2 = g.src.shape[0]
    logits = jnp.asarray(rng.standard_normal(e2).astype(np.float32) * 3)
    msgs = jnp.asarray(rng.standard_normal((e2, f)).astype(np.float32))
    out = np.asarray(attention_softmax_aggregate(g, logits, msgs))

    dst = np.asarray(g.dst)
    lg = np.asarray(logits)
    ms = np.asarray(msgs)
    expect = np.zeros((n, f), np.float64)
    for d in range(n):
        m = dst == d
        if not m.any():
            continue
        a = np.exp(lg[m] - lg[m].max())
        a /= a.sum()
        expect[d] = (ms[m] * a[:, None]).sum(0)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-4)


def test_attention_aggregate_grads_finite():
    from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv import (
        attention_softmax_aggregate, build_attention_graph)

    rng = np.random.default_rng(1)
    n = 64
    ei = np.stack([rng.integers(0, n, 300), rng.integers(0, n, 300)])
    g = build_attention_graph([(ei, 0, True)], n)
    e2 = g.src.shape[0]
    logits = jnp.asarray(rng.standard_normal(e2).astype(np.float32))
    msgs = jnp.asarray(rng.standard_normal((e2, 4)).astype(np.float32))
    gl, gm = jax.grad(
        lambda l, m: jnp.sum(attention_softmax_aggregate(g, l, m) ** 2),
        argnums=(0, 1))(logits, msgs)
    assert np.isfinite(np.asarray(gl)).all()
    assert np.isfinite(np.asarray(gm)).all()


class TestSNEAPairFusion:
    """Fast unit parity for the fused pair attention path (round-4
    optimization): _attend_pair == two _attend calls, the pair aggregate
    == two single aggregates, the XLA baseline backend matches the MXU
    path, and the width-gate fallback is numerically identical."""

    def _graph(self, n=40, e=160, seed=0):
        from pytorch_geometric_signed_directed_tpu.nn.signed import (
            snea_conv)

        rng = np.random.default_rng(seed)
        pos = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
        neg = np.vstack([rng.integers(0, n, e // 2),
                         rng.integers(0, n, e // 2)])
        g = snea_conv.build_attention_graph(
            [(pos, 0, True), (neg, 1, False)], n)
        return rng, g, n

    def test_aggregate_pair_matches_two_singles(self):
        from pytorch_geometric_signed_directed_tpu.nn.signed import (
            snea_conv)

        rng, g, n = self._graph()
        e2 = g.src.shape[0]
        l1 = jnp.asarray(rng.standard_normal(e2), jnp.float32)
        l2 = jnp.asarray(rng.standard_normal(e2), jnp.float32)
        m1 = jnp.asarray(rng.standard_normal((e2, 8)), jnp.float32)
        m2 = jnp.asarray(rng.standard_normal((e2, 8)), jnp.float32)
        o1, o2 = snea_conv.attention_softmax_aggregate_pair(
            g, l1, m1, l2, m2)
        r1 = snea_conv.attention_softmax_aggregate(g, l1, m1)
        r2 = snea_conv.attention_softmax_aggregate(g, l2, m2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(r1),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(o2), np.asarray(r2),
                                   rtol=1e-4, atol=1e-5)

    def test_attend_pair_matches_two_attends(self):
        import flax.linen as fnn
        from pytorch_geometric_signed_directed_tpu.nn.signed import (
            snea_conv)

        rng, g, n = self._graph(seed=1)
        f = 8
        x1b, x2b, x1u, x2u = (
            jnp.asarray(rng.standard_normal((n, f)), jnp.float32)
            for _ in range(4))
        dense_b, dense_u = fnn.Dense(1), fnn.Dense(1)
        zero = jnp.zeros((1, 2 * f))
        ab = dense_b.bind(dense_b.init(jax.random.PRNGKey(0), zero))
        au = dense_u.bind(dense_u.init(jax.random.PRNGKey(1), zero))
        ob, ou = snea_conv._attend_pair(x1b, x2b, x1u, x2u, g, ab, au)
        rb = snea_conv._attend(x1b, x2b, g, ab)
        ru = snea_conv._attend(x1u, x2u, g, au)
        np.testing.assert_allclose(np.asarray(ob), np.asarray(rb),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ou), np.asarray(ru),
                                   rtol=1e-4, atol=1e-5)

    def test_xla_backend_matches_mxu(self):
        from pytorch_geometric_signed_directed_tpu.nn.signed import (
            snea_conv)

        rng, g, n = self._graph(seed=2)
        e2 = g.src.shape[0]
        l1 = jnp.asarray(rng.standard_normal(e2), jnp.float32)
        l2 = jnp.asarray(rng.standard_normal(e2), jnp.float32)
        m1 = jnp.asarray(rng.standard_normal((e2, 8)), jnp.float32)
        m2 = jnp.asarray(rng.standard_normal((e2, 8)), jnp.float32)
        mxu_single = snea_conv.attention_softmax_aggregate(g, l1, m1)
        mxu_pair = snea_conv.attention_softmax_aggregate_pair(
            g, l1, m1, l2, m2)
        assert snea_conv.AGGREGATE_BACKEND == "mxu"
        snea_conv.AGGREGATE_BACKEND = "xla"
        try:
            xla_single = snea_conv.attention_softmax_aggregate(g, l1, m1)
            xla_pair = snea_conv.attention_softmax_aggregate_pair(
                g, l1, m1, l2, m2)
        finally:
            snea_conv.AGGREGATE_BACKEND = "mxu"
        np.testing.assert_allclose(np.asarray(mxu_single),
                                   np.asarray(xla_single),
                                   rtol=1e-4, atol=1e-5)
        for a, b in zip(mxu_pair, xla_pair):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_width_gate_fallback_parity(self):
        from pytorch_geometric_signed_directed_tpu.nn.signed import (
            snea_conv)
        from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv \
            import SNEAConv

        rng, g, n = self._graph(seed=3)
        conv = SNEAConv(in_dim=8, out_dim=8, first_aggr=False)
        x = jnp.asarray(rng.standard_normal((n, 16)), jnp.float32)
        params = conv.init(jax.random.PRNGKey(0), x, g, g, g)
        out_fused = conv.apply(params, x, g, g, g)
        old = snea_conv.PAIR_FUSION_MAX_LANES
        snea_conv.PAIR_FUSION_MAX_LANES = 1  # force the two-attend path
        try:
            out_two = conv.apply(params, x, g, g, g)
        finally:
            snea_conv.PAIR_FUSION_MAX_LANES = old
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_two),
                                   rtol=1e-4, atol=1e-5)


def test_sgcn_fused_dual_matches_separate():
    """SGCN with the union-edge-set DualPropagator (one gather+scatter
    per layer-half) == SGCN with two separate mean propagators."""
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        DualPropagator)

    rng = np.random.default_rng(11)
    n, e = 80, 400
    edges = np.column_stack([rng.integers(0, n, e), rng.integers(0, n, e),
                             rng.choice([-1, 1], e)]).astype(np.int64)
    pos, neg, emb, P_pos, P_neg = prepare_sgcn_inputs(
        n, edges, in_dim=8, mode="mxu")
    _, _, _, D, none = prepare_sgcn_inputs(
        n, edges, in_dim=8, init_emb=emb, mode="mxu", fused=True)
    assert none is None and isinstance(D, DualPropagator)
    model = SGCN(node_num=n, in_dim=8, out_dim=8, layer_num=3,
                 init_emb=emb)
    params = model.init(jax.random.PRNGKey(0), P_pos, P_neg)
    z_sep = model.apply(params, P_pos, P_neg)
    z_fused = model.apply(params, D, None)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_sep),
                               rtol=1e-4, atol=1e-5)
    # gradients through the fused path match too
    g_sep = jax.grad(lambda p: (model.apply(p, P_pos, P_neg) ** 2).sum()
                     )(params)
    g_fused = jax.grad(lambda p: (model.apply(p, D, None) ** 2).sum()
                       )(params)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_sep)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
