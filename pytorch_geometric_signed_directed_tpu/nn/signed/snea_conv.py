"""SNEAConv: signed attention convolution.

Reference: nn/signed/SNEAConv.py:12-150.  The per-edge attention (Linear on
concat(src, dst) -> tanh -> softmax by destination) runs on static padded
edge structures (AttnGraph) via gather + segment_softmax + segment_sum —
the TPU equivalent of PyG's softmax-by-index message passing.

Faithful to the reference's message function (:135-146): the aggregated
message is alpha * x_i where x_i is the *destination* feature selected per
edge type — not the source feature.
"""
from typing import Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from ...ops.segment import segment_softmax, segment_sum
from ...ops.pallas.scatter_mxu import (
    ScatterPlan,
    build_scatter_plan,
    permute_edge_data,
    scatter_sum,
)

_xavier_normal = nn.initializers.xavier_normal()

# Aggregation backend for BOTH the single and pair attention paths:
#   "mxu"  — Pallas scatter-plan one-hot-matmul segment sums (default)
#   "xla"  — XLA segment_softmax / segment_sum (what a faithful port of
#            PyG's softmax-by-index message passing would do); used as the
#            structural bench baseline so XLA-vs-Pallas comparisons cover
#            every path (bench.py swaps this flag, not a function).
AGGREGATE_BACKEND = "mxu"

# The fused pair path gathers a lane-stacked [N, 4F] table; row gathers
# are width-free only up to 128 lanes (see _template_pair_forward's dup
# gate), so wider configs fall back to two separate attends.
PAIR_FUSION_MAX_LANES = 128


@struct.dataclass
class AttnGraph:
    """Padded edge structure in scatter-plan order (grouped by 128-row
    destination window, window-local ascending).

    src/dst: [E2] int32 (dst == num_nodes marks padding).
    edge_p:  [E2] int32 edge-type selector (0 balanced / 1 unbalanced).
    plan: the MXU scatter plan over dst — segment sums run as one-hot
    matmuls (ops/pallas/scatter_mxu) instead of XLA scatters.
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    edge_p: jnp.ndarray
    plan: ScatterPlan
    num_nodes: int = struct.field(pytree_node=False)


def build_attention_graph(edge_sets, num_nodes: int,
                          pad_multiple: int = 8) -> AttnGraph:
    """edge_sets: list of (edge_index [2, E], flag, add_self_loops)."""
    srcs, dsts, flags = [], [], []
    for edge_index, flag, loops in edge_sets:
        edge_index = np.asarray(edge_index)
        if edge_index.size:
            mask = edge_index[0] != edge_index[1]
            edge_index = edge_index[:, mask]
        s, d = edge_index[0], edge_index[1]
        if loops:
            s = np.concatenate([s, np.arange(num_nodes)])
            d = np.concatenate([d, np.arange(num_nodes)])
        srcs.append(s)
        dsts.append(d)
        flags.append(np.full(len(s), flag))
    src = np.concatenate(srcs).astype(np.int64)
    dst = np.concatenate(dsts).astype(np.int64)
    flag = np.concatenate(flags).astype(np.int32)
    order = np.argsort(dst, kind="stable")
    src, dst, flag = src[order], dst[order], flag[order]
    plan, perm = build_scatter_plan(dst, num_nodes)
    psrc, pflag = permute_edge_data(perm, src.astype(np.int32),
                                    flag.astype(np.int32))
    pdst = np.full(len(perm), num_nodes, np.int32)
    pdst[perm >= 0] = dst[perm[perm >= 0]].astype(np.int32)
    return AttnGraph(src=jnp.asarray(psrc), dst=jnp.asarray(pdst),
                     edge_p=jnp.asarray(pflag), plan=plan,
                     num_nodes=num_nodes)


def _xla_softmax_aggregate(g: AttnGraph, logits: jnp.ndarray,
                           msgs: jnp.ndarray) -> jnp.ndarray:
    """XLA-segment-op aggregation (the structural bench baseline)."""
    seg = jnp.minimum(g.dst, g.num_nodes)
    alpha = segment_softmax(logits, seg, g.num_nodes + 1)
    out = segment_sum(msgs * alpha[:, None], seg, g.num_nodes + 1)
    return out[: g.num_nodes]


def attention_softmax_aggregate(g: AttnGraph, logits: jnp.ndarray,
                                msgs: jnp.ndarray) -> jnp.ndarray:
    """softmax(logits) over edges grouped by destination, then weighted
    aggregation of msgs — both segment sums on the MXU scatter plan.

    Numerical stability uses a single global shift: per-segment softmax is
    invariant to any constant shift, and a global max bounds exp() above;
    padding rows contribute zero and empty segments divide by the tiny
    guard.
    """
    if AGGREGATE_BACKEND == "xla":
        return _xla_softmax_aggregate(g, logits, msgs)
    n = g.num_nodes
    valid = g.dst < n
    neg_inf = jnp.finfo(logits.dtype).min
    shift = jnp.max(jnp.where(valid, logits, neg_inf))
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    ex = jnp.where(valid, jnp.exp(logits - shift), 0.0)
    # single fused scatter: [denominator | exp-weighted msgs] — avoids a
    # second (1-lane, pathological) scatter and the per-edge denom gather
    stacked = jnp.concatenate([ex[:, None], msgs * ex[:, None]], axis=1)
    agg = scatter_sum(g.plan, stacked)
    denom = jnp.maximum(agg[:, :1], jnp.finfo(logits.dtype).tiny)
    return agg[:, 1:] / denom


def attention_softmax_aggregate_pair(g: AttnGraph, l1, m1, l2, m2):
    """TWO softmax-by-destination aggregations over the SAME plan in one
    scatter: [denom1 | msgs1 | denom2 | msgs2] lanes.  Identical math to
    two attention_softmax_aggregate calls (one shared global shift —
    per-segment softmax is shift-invariant); halves the number of
    sub-full-lane scatter passes."""
    if AGGREGATE_BACKEND == "xla":
        return (_xla_softmax_aggregate(g, l1, m1),
                _xla_softmax_aggregate(g, l2, m2))
    n = g.num_nodes
    valid = g.dst < n
    neg_inf = jnp.finfo(l1.dtype).min
    shift = jnp.max(jnp.where(valid, jnp.maximum(l1, l2), neg_inf))
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    ex1 = jnp.where(valid, jnp.exp(l1 - shift), 0.0)
    ex2 = jnp.where(valid, jnp.exp(l2 - shift), 0.0)
    f = m1.shape[1]
    stacked = jnp.concatenate(
        [ex1[:, None], m1 * ex1[:, None], ex2[:, None], m2 * ex2[:, None]],
        axis=1)
    agg = scatter_sum(g.plan, stacked)
    tiny = jnp.finfo(l1.dtype).tiny
    o1 = agg[:, 1:f + 1] / jnp.maximum(agg[:, :1], tiny)
    o2 = agg[:, f + 2:] / jnp.maximum(agg[:, f + 1:f + 2], tiny)
    return o1, o2


def _attend_pair(x1b, x2b, x1u, x2u, g: AttnGraph, alpha_b, alpha_u):
    """Two _attend calls that share one AttnGraph, fused: ONE lane-stacked
    [4F] src gather + one dst gather replace the pair's eight [F]
    gathers (the row gather is row-rate-bound, width-free to 128 lanes),
    and both aggregations ride one scatter (see
    attention_softmax_aggregate_pair).  Flat AttnGraph only — the
    sharded path keeps per-attend applies."""
    n = g.num_nodes
    src = jnp.minimum(g.src, n - 1)
    dst = jnp.minimum(g.dst, n - 1)
    f = x1b.shape[1]
    T = jnp.concatenate([x1b, x2b, x1u, x2u], axis=1)
    gs, gd = T[src], T[dst]
    sel = (g.edge_p == 1)[:, None]
    hj_b = jnp.where(sel, gs[:, f:2 * f], gs[:, :f])
    hi_b = jnp.where(sel, gd[:, f:2 * f], gd[:, :f])
    hj_u = jnp.where(sel, gs[:, 3 * f:], gs[:, 2 * f:3 * f])
    hi_u = jnp.where(sel, gd[:, 3 * f:], gd[:, 2 * f:3 * f])
    lb = jnp.tanh(alpha_b(jnp.concatenate([hj_b, hi_b], axis=-1)))[:, 0]
    lu = jnp.tanh(alpha_u(jnp.concatenate([hj_u, hi_u], axis=-1)))[:, 0]
    return attention_softmax_aggregate_pair(g, lb, hi_b, lu, hi_u)


def snea_graphs(pos_edge_index, neg_edge_index, num_nodes: int
                ) -> Tuple[AttnGraph, AttnGraph, AttnGraph]:
    """(pos+loops, neg+loops, concat[pos+loops ; neg]) — the structures the
    reference rebuilds per forward (:88-127), frozen once."""
    g_pos = build_attention_graph([(pos_edge_index, 0, True)], num_nodes)
    g_neg = build_attention_graph([(neg_edge_index, 0, True)], num_nodes)
    g_cat = build_attention_graph(
        [(pos_edge_index, 0, True), (neg_edge_index, 1, False)], num_nodes)
    return g_pos, g_neg, g_cat


def _attend(x1, x2, g: AttnGraph, alpha_dense: nn.Dense):
    """One attention propagate: returns [N, F].

    Accepts either a flat AttnGraph or a parallel.attn_shard
    ShardedAttnGraph — the sharded path evaluates the same per-edge math
    inside shard_map on each device's plan-ordered edges.
    """
    from ...parallel.attn_shard import (
        ShardedAttnGraph,
        sharded_attention_apply,
    )

    if isinstance(g, ShardedAttnGraph):
        # materialize the Dense's params OUTSIDE shard_map (param creation
        # inside a traced body would store tracers under .init); the call
        # inside edge_fn then only reads them
        alpha_dense(jnp.zeros((1, 2 * x1.shape[-1]), x1.dtype))

        def edge_fn(src, dst, ep, valid):
            sel = (ep == 1)[:, None]
            h_j = jnp.where(sel, x2[src], x1[src])
            h_i = jnp.where(sel, x2[dst], x1[dst])
            edge_h = jnp.concatenate([h_j, h_i], axis=-1)
            return jnp.tanh(alpha_dense(edge_h))[:, 0], h_i

        return sharded_attention_apply(g, edge_fn)

    n = g.num_nodes
    src = jnp.minimum(g.src, n - 1)
    dst_safe = jnp.minimum(g.dst, n - 1)
    sel = (g.edge_p == 1)[:, None]
    h_j = jnp.where(sel, x2[src], x1[src])
    h_i = jnp.where(sel, x2[dst_safe], x1[dst_safe])
    edge_h = jnp.concatenate([h_j, h_i], axis=-1)
    logits = jnp.tanh(alpha_dense(edge_h))[:, 0]
    return attention_softmax_aggregate(g, logits, h_i)


class SNEAConv(nn.Module):
    """Signed attention conv (SNEA, AAAI'20): per-edge attention
    Dense(2*out) -> tanh -> softmax-by-destination, with the edge-type
    selector indexing stacked (balanced, unbalanced) messages; faithful
    to the reference's aggregate-x_i quirk.

    Reference: nn/signed/SNEAConv.py:12-150 (quirk :135-148).
    """

    in_dim: int
    out_dim: int
    first_aggr: bool
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, g_pos: AttnGraph, g_neg: AttnGraph,
                 g_cat: AttnGraph) -> jnp.ndarray:
        lin_b = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_b")
        lin_u = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_u")
        alpha_b = nn.Dense(1, kernel_init=_xavier_normal, name="alpha_b")
        alpha_u = nn.Dense(1, kernel_init=_xavier_normal, name="alpha_u")
        if self.first_aggr:
            h_b = lin_b(x)
            h_u = lin_u(x)
            out_b = _attend(h_b, h_b, g_pos, alpha_b)
            out_u = _attend(h_u, h_u, g_neg, alpha_u)
        else:
            F_in = self.in_dim
            h_b, h_u = x[..., :F_in], x[..., F_in:]
            fuse = (isinstance(g_cat, AttnGraph)
                    and AGGREGATE_BACKEND == "mxu"
                    and 4 * self.out_dim <= PAIR_FUSION_MAX_LANES)
            if fuse:
                # both attends share g_cat's plan: fused pair path
                out_b, out_u = _attend_pair(
                    lin_b(h_b), lin_b(h_u), lin_u(h_u), lin_u(h_b),
                    g_cat, alpha_b, alpha_u)
            else:
                out_b = _attend(lin_b(h_b), lin_b(h_u), g_cat, alpha_b)
                out_u = _attend(lin_u(h_u), lin_u(h_b), g_cat, alpha_u)
        return jnp.concatenate([out_b, out_u], axis=-1)
