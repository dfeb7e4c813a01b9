"""Parity of the fused motif stack (one scatter over G*N rows) vs the
sequential per-motif GATConv loop, at module and model level."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_signed_directed_tpu.nn import SDGNN, SiGAT
from pytorch_geometric_signed_directed_tpu.nn.signed.motif_stack import (
    MotifGATStack,
    build_motif_stack,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
    prepare_sdgnn_inputs,
)
from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
    prepare_sigat_inputs,
)


def _signed_edges(n, e, rng):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    sign = rng.choice([-1, 1], e)
    return np.column_stack([src, dst, sign]).astype(np.int64)


def _stack_params_from_sequential(seq_params, G):
    """Repack per-motif GATConv params {agg_i: {Dense_0/kernel, att_src,
    att_dst, bias}} into the MotifGATStack layout."""
    aggs = [seq_params[f"agg_{i}"] for i in range(G)]
    return {
        "kernel": jnp.stack([a["Dense_0"]["kernel"] for a in aggs]),
        "att_src": jnp.stack([a["att_src"] for a in aggs]),
        "att_dst": jnp.stack([a["att_dst"] for a in aggs]),
        "bias": jnp.stack([a["bias"] for a in aggs]),
    }


def test_stack_module_matches_sequential_gats():
    from pytorch_geometric_signed_directed_tpu.nn.signed.gat_conv import (
        GATConv, gat_graph)

    rng = np.random.default_rng(0)
    n, G, f = 50, 5, 8
    edge_lists = [np.vstack([rng.integers(0, n, 40),
                             rng.integers(0, n, 40)]) for _ in range(G)]
    edge_lists[2] = np.zeros((2, 0), np.int64)  # one empty motif graph
    x = jnp.asarray(rng.standard_normal((n, 12)), jnp.float32)

    graphs = [gat_graph(e, n) for e in edge_lists]
    convs = [GATConv(f) for _ in range(G)]
    seq_params, seq_outs = {}, []
    for i, (conv, g) in enumerate(zip(convs, graphs)):
        p = conv.init(jax.random.PRNGKey(i), x, g)
        seq_params[f"agg_{i}"] = p["params"]
        seq_outs.append(conv.apply(p, x, g))

    stack = build_motif_stack(edge_lists, n)
    assert stack.num_graphs == G and stack.num_nodes == n
    mod = MotifGATStack(out_dim=f, num_graphs=G)
    sp = {"params": _stack_params_from_sequential(seq_params, G)}
    outs = mod.apply(sp, x, stack)
    assert outs.shape == (G, n, f)
    for i in range(G):
        np.testing.assert_allclose(np.asarray(outs[i]),
                                   np.asarray(seq_outs[i]),
                                   rtol=1e-4, atol=1e-5)


def _remap_sigat(params):
    out = dict(params)
    G = sum(1 for k in params if k.startswith("agg_")
            and not k.endswith("stack"))
    out["agg_stack"] = _stack_params_from_sequential(params, G)
    for i in range(G):
        out.pop(f"agg_{i}")
    return out


def test_sigat_fused_model_parity():
    rng = np.random.default_rng(1)
    n = 60
    edges = _signed_edges(n, 240, rng)
    pos, neg, emb, graphs = prepare_sigat_inputs(n, edges, in_dim=8)
    _, _, _, stack = prepare_sigat_inputs(n, edges, in_dim=8,
                                          init_emb=emb, fused=True)
    model = SiGAT(node_num=n, in_dim=8, out_dim=8, init_emb=emb)
    params = model.init(jax.random.PRNGKey(0), graphs)
    z_seq = model.apply(params, graphs)
    fused_params = {"params": _remap_sigat(params["params"])}
    z_fused = model.apply(fused_params, stack)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_seq),
                               rtol=1e-4, atol=1e-5)
    # losses match too
    l_seq = model.apply(params, graphs, pos, neg, method=SiGAT.loss)
    l_fused = model.apply(fused_params, stack, pos, neg,
                          method=SiGAT.loss)
    np.testing.assert_allclose(float(l_fused), float(l_seq), rtol=1e-4)


def test_sdgnn_fused_model_parity():
    rng = np.random.default_rng(2)
    n = 60
    edges = _signed_edges(n, 240, rng)
    pos, neg, emb, graphs, w_pos, w_neg = prepare_sdgnn_inputs(
        n, edges, in_dim=8)
    _, _, _, stack, _, _ = prepare_sdgnn_inputs(
        n, edges, in_dim=8, init_emb=emb, fused=True)
    model = SDGNN(node_num=n, in_dim=8, out_dim=8, layer_num=2,
                  init_emb=emb)
    params = model.init(jax.random.PRNGKey(0), graphs, pos, neg, w_pos,
                        w_neg, method=SDGNN.loss)
    z_seq = model.apply(params, graphs)

    newp = {}
    for k, v in params["params"].items():
        if k.startswith("SDRLayer_"):
            layer = dict(v)
            layer["agg_stack"] = _stack_params_from_sequential(v, 4)
            for i in range(4):
                layer.pop(f"agg_{i}")
            newp[k] = layer
        else:
            newp[k] = v
    z_fused = model.apply({"params": newp}, stack)
    np.testing.assert_allclose(np.asarray(z_fused), np.asarray(z_seq),
                               rtol=1e-4, atol=1e-5)
    l_seq = model.apply(params, graphs, pos, neg, w_pos, w_neg,
                        method=SDGNN.loss)
    l_fused = model.apply({"params": newp}, stack, pos, neg, w_pos,
                          w_neg, method=SDGNN.loss)
    np.testing.assert_allclose(float(l_fused), float(l_seq), rtol=1e-4)


def test_fused_grads_finite():
    rng = np.random.default_rng(3)
    n = 40
    edges = _signed_edges(n, 160, rng)
    pos, neg, emb, stack = prepare_sigat_inputs(n, edges, in_dim=8,
                                                fused=True)
    model = SiGAT(node_num=n, in_dim=8, out_dim=8, init_emb=emb)
    params = model.init(jax.random.PRNGKey(0), stack)
    grads = jax.grad(
        lambda p: model.apply(p, stack, pos, neg, method=SiGAT.loss)
    )(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_motif_attend_custom_vjp_matches_autodiff():
    """The fused attend's hand-written backward (plan scatters) must
    match plain XLA autodiff of the same math."""
    import flax.linen as fnn
    from pytorch_geometric_signed_directed_tpu.nn.signed.motif_stack \
        import motif_attend, build_motif_stack
    from pytorch_geometric_signed_directed_tpu.nn.signed.snea_conv \
        import attention_softmax_aggregate

    rng = np.random.default_rng(5)
    n, G, f = 40, 4, 8
    edge_lists = [np.vstack([rng.integers(0, n, 60),
                             rng.integers(0, n, 60)]) for _ in range(G)]
    ms = build_motif_stack(edge_lists, n)
    GN = G * n
    T = jnp.asarray(rng.standard_normal((GN, f)), jnp.float32)
    a_src = jnp.asarray(rng.standard_normal(GN), jnp.float32)
    a_dst = jnp.asarray(rng.standard_normal(GN), jnp.float32)

    def ref(T, a_src, a_dst):
        g = ms.g
        src = jnp.minimum(g.src, GN - 1)
        dst = jnp.minimum(g.dst, GN - 1)
        logits = fnn.leaky_relu(a_src[src] + a_dst[dst], 0.2)
        return attention_softmax_aggregate(g, logits, T[src])

    out_f = motif_attend(0.2, ms, T, a_src, a_dst)
    out_r = ref(T, a_src, a_dst)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)

    w = jnp.asarray(rng.standard_normal(out_r.shape), jnp.float32)
    gf = jax.grad(lambda *a: (motif_attend(0.2, ms, *a) * w).sum(),
                  argnums=(0, 1, 2))(T, a_src, a_dst)
    gr = jax.grad(lambda *a: (ref(*a) * w).sum(),
                  argnums=(0, 1, 2))(T, a_src, a_dst)
    for a, b, name in zip(gf, gr, ("dT", "da_src", "da_dst")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)
