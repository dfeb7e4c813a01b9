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
