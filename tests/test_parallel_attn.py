"""Model-level multi-chip parity: the attention tier (SNEA/GAT) and the
propagator-set models (SGCN/SSSNET/DIGRAC) run sharded on the 8-device CPU
mesh and must match single-device forward AND gradients (SURVEY.md §4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_signed_directed_tpu.data import SSBM, SignedData
from pytorch_geometric_signed_directed_tpu.graph import rw_norm_propagator
from pytorch_geometric_signed_directed_tpu.nn import (
    SGCN,
    SNEA,
    DIGRAC_node_clustering,
    SSSNET_node_clustering,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.gat_conv import (
    GATConv,
    gat_graph,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
    prepare_sgcn_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.snea import (
    prepare_snea_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv import (
    attention_softmax_aggregate,
    build_attention_graph,
)
from pytorch_geometric_signed_directed_tpu.parallel import (
    make_mesh,
    shard_attention_graph,
    shard_attention_graphs,
    shard_propagator,
    sharded_attention_apply,
)

N = 96


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def signed_graph():
    (A_p, A_n), labels = SSBM(N, 2, 0.3, 0.1, size_ratio=1,
                              rng=np.random.default_rng(3))
    d = SignedData(A=(A_p, A_n), y=labels)
    ei = d.edge_index
    w = d.edge_weight
    edge_index_s = np.concatenate(
        [ei.T, np.sign(w)[:, None].astype(np.int64)], axis=1)
    return d, edge_index_s


def _tree_allclose(a, b, rtol=2e-4, atol=2e-4):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_sharded_attention_apply_matches_flat(mesh):
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, 700)
    dst = rng.integers(0, N, 700)
    g = build_attention_graph([(np.vstack([src, dst]), 0, True)], N)
    sg = shard_attention_graph(g, mesh)
    x = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))

    def flat(x, w):
        s = jnp.minimum(g.src, N - 1)
        return attention_softmax_aggregate(g, x[s] @ w, x[s])

    def sharded(x, w):
        def edge_fn(s, d, ep, valid):
            return x[s] @ w, x[s]

        return sharded_attention_apply(sg, edge_fn)

    ref = flat(x, w)
    with mesh:
        out = jax.jit(sharded)(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    gref = jax.grad(lambda x, w: (flat(x, w) ** 2).sum(), (0, 1))(x, w)
    with mesh:
        gsh = jax.jit(jax.grad(lambda x, w: (sharded(x, w) ** 2).sum(),
                               (0, 1)))(x, w)
    _tree_allclose(gsh, gref)


@pytest.mark.slow
def test_sharded_snea_model_fwd_and_grad(mesh, signed_graph):
    _, edge_index_s = signed_graph
    pos_ei, neg_ei, init_emb, graphs = prepare_snea_inputs(
        N, edge_index_s, in_dim=16)
    model = SNEA(node_num=N, in_dim=16, out_dim=16, layer_num=2,
                 init_emb=init_emb)
    params = model.init(jax.random.PRNGKey(0), graphs)
    sgraphs = shard_attention_graphs(graphs, mesh)

    ref = model.apply(params, graphs)
    with mesh:
        out = jax.jit(lambda p, g: model.apply(p, g))(params, sgraphs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def scalar(p, g):
        return (model.apply(p, g) ** 2).sum()

    gref = jax.grad(scalar)(params, graphs)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, sgraphs)
    _tree_allclose(gsh, gref)


def test_sharded_gatconv_fwd_and_grad(mesh):
    rng = np.random.default_rng(1)
    src = rng.integers(0, N, 500)
    dst = rng.integers(0, N, 500)
    g = gat_graph(np.vstack([src, dst]), N)
    sg = shard_attention_graph(g, mesh)
    x = jnp.asarray(rng.standard_normal((N, 8)).astype(np.float32))
    conv = GATConv(out_dim=8)
    params = conv.init(jax.random.PRNGKey(0), x, g)

    ref = conv.apply(params, x, g)
    with mesh:
        out = jax.jit(lambda p, v: conv.apply(p, v, sg))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    gref = jax.grad(lambda p, v: (conv.apply(p, v, g) ** 2).sum(),
                    (0, 1))(params, x)
    with mesh:
        gsh = jax.jit(jax.grad(
            lambda p, v: (conv.apply(p, v, sg) ** 2).sum(), (0, 1)))(params, x)
    _tree_allclose(gsh, gref)


@pytest.mark.parametrize("mode", ["segment", "mxu"])
def test_sharded_sgcn_model_fwd_and_grad(mesh, signed_graph, mode):
    _, edge_index_s = signed_graph
    pos_ei, neg_ei, init_emb, P_pos, P_neg = prepare_sgcn_inputs(
        N, edge_index_s, in_dim=16, mode=mode)
    model = SGCN(node_num=N, in_dim=16, out_dim=16, layer_num=2,
                 init_emb=init_emb)
    params = model.init(jax.random.PRNGKey(0), P_pos, P_neg)

    ref = model.apply(params, P_pos, P_neg)
    Ps, Ns = shard_propagator(P_pos, mesh), shard_propagator(P_neg, mesh)
    with mesh:
        out = jax.jit(lambda p, a, b: model.apply(p, a, b))(params, Ps, Ns)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def scalar(p, a, b):
        return (model.apply(p, a, b) ** 2).sum()

    gref = jax.grad(scalar)(params, P_pos, P_neg)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, Ps, Ns)
    _tree_allclose(gsh, gref)


@pytest.mark.slow
def test_sharded_sssnet_model_fwd_and_grad(mesh, signed_graph):
    d, _ = signed_graph
    d.separate_positive_negative()
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((N, 4)).astype(np.float32))
    P_p = rw_norm_propagator(d.edge_index_p, d.edge_weight_p, N,
                             fill_value=0.5, mode="mxu")
    P_n = rw_norm_propagator(d.edge_index_n, d.edge_weight_n, N,
                             fill_value=0.0, mode="mxu")
    model = SSSNET_node_clustering(nfeat=4, hidden=8, nclass=2)
    params = model.init(jax.random.PRNGKey(0), P_p, P_n, x)

    ref = model.apply(params, P_p, P_n, x)
    Ps, Ns = shard_propagator(P_p, mesh), shard_propagator(P_n, mesh)
    with mesh:
        out = jax.jit(lambda p, a, b, v: model.apply(p, a, b, v))(
            params, Ps, Ns, x)
    for o, r in zip(out[:2] + (out[3],), ref[:2] + (ref[3],)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

    def scalar(p, a, b, v):
        _, logp, _, _ = model.apply(p, a, b, v)
        return (logp ** 2).sum()

    gref = jax.grad(scalar)(params, P_p, P_n, x)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, Ps, Ns, x)
    _tree_allclose(gsh, gref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_sharded_digrac_model_fwd_and_grad(mesh):
    rng = np.random.default_rng(2)
    src = rng.integers(0, N, 600)
    dst = rng.integers(0, N, 600)
    keep = src != dst
    ei = np.vstack([src[keep], dst[keep]])
    w = rng.uniform(0.5, 1.5, ei.shape[1])
    x = jnp.asarray(rng.standard_normal((N, 4)).astype(np.float32))
    P_s = rw_norm_propagator(ei, w, N, fill_value=0.5, mode="mxu")
    P_t = rw_norm_propagator(ei[[1, 0]], w, N, fill_value=0.5, mode="mxu")
    model = DIGRAC_node_clustering(num_features=4, hidden=8, nclass=3)
    params = model.init(jax.random.PRNGKey(0), P_s, P_t, x)

    ref = model.apply(params, P_s, P_t, x)
    Ss, Ts = shard_propagator(P_s, mesh), shard_propagator(P_t, mesh)
    with mesh:
        out = jax.jit(lambda p, a, b, v: model.apply(p, a, b, v))(
            params, Ss, Ts, x)
    for o, r in zip(out[:2] + (out[3],), ref[:2] + (ref[3],)):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)

    def scalar(p, a, b, v):
        _, logp, _, _ = model.apply(p, a, b, v)
        return (logp ** 2).sum()

    gref = jax.grad(scalar)(params, P_s, P_t, x)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, Ss, Ts, x)
    _tree_allclose(gsh, gref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_sharded_sigat_model_fwd_and_grad(mesh, signed_graph):
    """Full 38-motif-graph SiGAT forward + loss grad, sharded vs single
    (VERDICT r3 item 4; reference nn/signed/SiGAT.py:186-203)."""
    from pytorch_geometric_signed_directed_tpu.nn import SiGAT
    from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
        prepare_sigat_inputs,
    )

    _, edge_index_s = signed_graph
    pos_ei, neg_ei, init_emb, graphs = prepare_sigat_inputs(
        N, edge_index_s, in_dim=8)
    assert len(graphs) == 38
    model = SiGAT(node_num=N, in_dim=8, out_dim=8, init_emb=init_emb)
    params = model.init(jax.random.PRNGKey(0), graphs)
    sgraphs = shard_attention_graphs(graphs, mesh)

    ref = model.apply(params, graphs)
    with mesh:
        out = jax.jit(lambda p, g: model.apply(p, g))(params, sgraphs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def scalar(p, g):
        return model.apply(p, g, pos_ei, neg_ei, method=SiGAT.loss)

    gref = jax.grad(scalar)(params, graphs)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, sgraphs)
    _tree_allclose(gsh, gref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_sharded_sdgnn_model_fwd_and_grad(mesh, signed_graph):
    """2-layer SDGNN SDRLayer stack + full (sign+direction+triangle)
    loss grad, sharded vs single (reference nn/signed/SDGNN.py:13-64)."""
    from pytorch_geometric_signed_directed_tpu.nn import SDGNN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
        prepare_sdgnn_inputs,
    )

    _, edge_index_s = signed_graph
    pos_ei, neg_ei, init_emb, graphs, w_pos, w_neg = prepare_sdgnn_inputs(
        N, edge_index_s, in_dim=8)
    model = SDGNN(node_num=N, in_dim=8, out_dim=8, layer_num=2,
                  init_emb=init_emb)
    params = model.init(jax.random.PRNGKey(0), graphs, pos_ei, neg_ei,
                        w_pos, w_neg, method=SDGNN.loss)
    sgraphs = shard_attention_graphs(graphs, mesh)

    ref = model.apply(params, graphs)
    with mesh:
        out = jax.jit(lambda p, g: model.apply(p, g))(params, sgraphs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    def scalar(p, g):
        return model.apply(p, g, pos_ei, neg_ei, w_pos, w_neg,
                           method=SDGNN.loss)

    gref = jax.grad(scalar)(params, graphs)
    with mesh:
        gsh = jax.jit(jax.grad(scalar))(params, sgraphs)
    _tree_allclose(gsh, gref, rtol=5e-4, atol=5e-4)


@pytest.mark.slow
def test_sharded_digcl_loss_step(mesh):
    """DiGCL contrastive loss on sharded mxu propagators vs single
    (reference nn/directed/DiGCL.py:60-199)."""
    from pytorch_geometric_signed_directed_tpu.graph import (
        gcn_norm_propagator,
    )
    from pytorch_geometric_signed_directed_tpu.nn import DiGCL

    rng = np.random.default_rng(7)
    src = rng.integers(0, N, 700)
    dst = rng.integers(0, N, 700)
    keep = src != dst
    ei = np.vstack([src[keep], dst[keep]])
    w = rng.uniform(0.5, 1.5, ei.shape[1])
    x = jnp.asarray(rng.standard_normal((N, 12)).astype(np.float32))
    P1 = gcn_norm_propagator(ei, w, N, mode="mxu")
    P2 = gcn_norm_propagator(ei[[1, 0]], w, N, mode="mxu")
    model = DiGCL(in_channels=12, activation="relu", num_hidden=8,
                  num_proj_hidden=8, tau=0.4, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), x, P1,
                        method=DiGCL.warmup)

    def contrastive(p, Pa, Pb):
        z1 = model.apply(p, x, Pa)
        z2 = model.apply(p, x, Pb)
        return model.apply(p, z1, z2, method=DiGCL.loss)

    ref = contrastive(params, P1, P2)
    S1, S2 = shard_propagator(P1, mesh), shard_propagator(P2, mesh)
    with mesh:
        out = jax.jit(contrastive)(params, S1, S2)
    np.testing.assert_allclose(float(out), float(ref), rtol=2e-4,
                               atol=2e-4)

    gref = jax.grad(contrastive)(params, P1, P2)
    with mesh:
        gsh = jax.jit(jax.grad(contrastive))(params, S1, S2)
    _tree_allclose(gsh, gref, rtol=5e-4, atol=5e-4)
