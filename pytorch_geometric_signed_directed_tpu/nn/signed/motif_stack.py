"""Fused motif attention: G single-head GATs over G motif graphs
collapsed into ONE gather + ONE scatter on a [G*N] row space.

SiGAT runs 38 motif GATConvs sequentially over the SAME x (reference
nn/signed/SiGAT.py:186-203) and SDGNN 4 per layer (SDGNN.py:13-64) —
the most per-call-overhead-bound shape in the zoo: each attend is a
small gather + segment-softmax + sub-full-lane scatter.  The TPU-native
fix is to stack the motifs:

  * per-motif Dense kernels become one [G, in, out] batched matmul
    (a single large MXU contraction instead of G small ones),
  * motif g's edge (s, d) becomes (g*N + s, g*N + d), so all G
    attention aggregations ride ONE scatter plan over G*N rows and one
    row gather from the [G*N, out] stacked feature table,
  * per-edge attention logits/softmax are unchanged per motif — the
    plan keys on global destination, and destinations never collide
    across motifs, so segment softmax per (motif, node) is identical to
    the per-motif computation.

The stacked parameters use the same initializers/fan shapes as the
per-motif GATConv (xavier over the trailing (in, out) axes), so
training behavior matches; numerical parity vs the sequential path is
asserted in tests/test_motif_stack.py.
"""
from functools import partial
from typing import List

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from .snea_conv import AttnGraph
from ...ops.pallas.scatter_mxu import (
    ScatterPlan,
    build_scatter_plan,
    permute_edge_data,
    scatter_sum,
)

_glorot = nn.initializers.xavier_uniform()


@struct.dataclass
class MotifStackGraph:
    """G motif graphs as one AttnGraph over a G*N row space.

    src_plan/src_perm: a SECOND scatter plan keyed on the source ids
    (one extra "trash" row G*N collects the padding slots), used by the
    fused attend's backward — the gradients of the T[src] gather and of
    a_src[src] ride one Pallas scatter instead of XLA scatter-adds
    (measured 11.5 + 15 ms at bitcoin_alpha scale, the whole reason the
    round-5 fusion initially LOST its forward win in the backward).
    src_perm maps src-plan order -> forward edge index (E2 = padding).
    """

    g: AttnGraph                                   # num_nodes = G*N
    src_plan: ScatterPlan                          # over src, G*N+1 rows
    src_perm: jnp.ndarray                          # [E2b] int32
    num_nodes: int = struct.field(pytree_node=False)   # N
    num_graphs: int = struct.field(pytree_node=False)  # G


def build_motif_stack(edge_lists: List[np.ndarray],
                      num_nodes: int) -> MotifStackGraph:
    """Concatenate G motif edge lists with per-motif row offsets.

    Mirrors gat_graph per motif: self-edges dropped, then self-loops for
    every node appended (PyG add_self_loops semantics)."""
    n = num_nodes
    G = len(edge_lists)
    srcs, dsts = [], []
    loops = np.arange(n, dtype=np.int64)
    for i, edge_index in enumerate(edge_lists):
        edge_index = np.asarray(edge_index)
        if edge_index.size:
            mask = edge_index[0] != edge_index[1]
            edge_index = edge_index[:, mask]
            s, d = edge_index[0], edge_index[1]
        else:
            s = d = np.zeros(0, np.int64)
        srcs.append(np.concatenate([s, loops]) + i * n)
        dsts.append(np.concatenate([d, loops]) + i * n)
    src = np.concatenate(srcs).astype(np.int64)
    dst = np.concatenate(dsts).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    plan, perm = build_scatter_plan(dst, G * n)
    (psrc,) = permute_edge_data(perm, src.astype(np.int32))
    pdst = np.full(len(perm), G * n, np.int32)
    pdst[perm >= 0] = dst[perm[perm >= 0]].astype(np.int32)
    g = AttnGraph(src=jnp.asarray(psrc), dst=jnp.asarray(pdst),
                  edge_p=jnp.zeros(len(perm), jnp.int32), plan=plan,
                  num_nodes=G * n)
    # backward plan over the source ids of the E2 forward slots;
    # padding slots (dst == G*n) go to the trash row G*n
    e2 = len(perm)
    src_rows = np.full(e2, G * n, np.int64)
    src_rows[perm >= 0] = psrc[perm >= 0]
    src_plan, perm2 = build_scatter_plan(src_rows, G * n + 1)
    src_perm = np.where(perm2 >= 0, perm2, e2).astype(np.int32)
    return MotifStackGraph(g=g, src_plan=src_plan,
                           src_perm=jnp.asarray(src_perm),
                           num_nodes=n, num_graphs=G)


def _zero_like_tree(t):
    return jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), t)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def motif_attend(slope: float, ms: MotifStackGraph, T, a_src, a_dst):
    """Fused single-head GAT attend over the stacked motif row space:
    logits = leaky_relu(a_src[src] + a_dst[dst]), softmax by
    destination, aggregate T[src].

    The custom backward recomputes the cheap per-edge terms (softmax
    grads need only GATHERS by dst) and lands every scatter on a plan:
    [dT | da_src] in one (f+1)-lane src-plan scatter, da_dst in one
    dst-plan scatter — no XLA scatter-adds anywhere.
    """
    out, _ = _attend_fwd(slope, ms, T, a_src, a_dst)
    return out


def _attend_edge_terms(slope, ms, T, a_src, a_dst):
    g = ms.g
    GN = g.num_nodes
    src = jnp.minimum(g.src, GN - 1)
    dst = jnp.minimum(g.dst, GN - 1)
    valid = g.dst < GN
    pre = a_src[src] + a_dst[dst]
    logit = jnp.where(pre >= 0, pre, slope * pre)
    neg_inf = jnp.finfo(T.dtype).min
    shift = jnp.max(jnp.where(valid, logit, neg_inf))
    shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
    ex = jnp.where(valid, jnp.exp(logit - shift), 0.0)
    msgs = T[src]
    return src, dst, valid, pre, ex, msgs


def _attend_fwd(slope, ms, T, a_src, a_dst):
    _, _, _, _, ex, msgs = _attend_edge_terms(slope, ms, T, a_src, a_dst)
    stacked = jnp.concatenate([ex[:, None], msgs * ex[:, None]], axis=1)
    agg = scatter_sum(ms.g.plan, stacked)
    S = jnp.maximum(agg[:, :1], jnp.finfo(T.dtype).tiny)
    out = agg[:, 1:] / S
    return out, (ms, T, a_src, a_dst, out, S)


def _attend_fwd_vjp(slope, ms, T, a_src, a_dst):
    return _attend_fwd(slope, ms, T, a_src, a_dst)


def _attend_bwd(slope, res, dout):
    ms, T, a_src, a_dst, out, S = res
    src, dst, valid, pre, ex, msgs = _attend_edge_terms(
        slope, ms, T, a_src, a_dst)
    GN = ms.g.num_nodes
    f = T.shape[1]
    alpha = ex / S[dst, 0]
    dout_e = dout[dst]                      # [E2, f] gather by dst
    dmsgs = alpha[:, None] * dout_e
    # softmax-weighted-sum logit grad: alpha * ((msgs - out[dst]).dout)
    dl = alpha * jnp.sum((msgs - out[dst]) * dout_e, axis=1)
    dpre = jnp.where(valid, dl * jnp.where(pre >= 0, 1.0, slope), 0.0)
    # ONE src-plan scatter carries [dT lanes | da_src lane]
    stacked = jnp.concatenate([dmsgs, dpre[:, None]], axis=1)
    stacked = jnp.concatenate(
        [stacked, jnp.zeros((1, f + 1), stacked.dtype)], axis=0)
    o2 = scatter_sum(ms.src_plan, stacked[ms.src_perm])
    dT = o2[:GN, :f]
    da_src = o2[:GN, f]
    # da_dst: dst-plan scatter (forward edge order IS dst-plan order)
    da_dst = scatter_sum(ms.g.plan, dpre[:, None])[:, 0]
    return _zero_like_tree(ms), dT, da_src, da_dst


motif_attend.defvjp(_attend_fwd_vjp, _attend_bwd)


class MotifGATStack(nn.Module):
    """G parallel single-head GATs sharing one scatter plan.

    Per-motif math identical to gat_conv.GATConv: h = x W_g (no bias),
    logits = leaky_relu(h a_src + h a_dst by edge), softmax by
    destination, aggregate h[src], + bias."""

    out_dim: int
    num_graphs: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, stack: MotifStackGraph
                 ) -> jnp.ndarray:
        G, n, f = stack.num_graphs, stack.num_nodes, self.out_dim
        kernel = self.param("kernel", _glorot, (G, x.shape[-1], f))
        att_src = self.param("att_src", _glorot, (G, f, 1))
        att_dst = self.param("att_dst", _glorot, (G, f, 1))
        bias = self.param("bias", nn.initializers.zeros, (G, f))
        H = jnp.einsum("ni,gif->gnf", x, kernel)
        a_src = jnp.einsum("gnf,gfo->gn", H, att_src).reshape(G * n)
        a_dst = jnp.einsum("gnf,gfo->gn", H, att_dst).reshape(G * n)
        T = H.reshape(G * n, f)
        out = motif_attend(self.negative_slope, stack, T, a_src, a_dst)
        return out.reshape(G, n, f) + bias[:, None, :]

    @staticmethod
    def concat(x: jnp.ndarray, outs: jnp.ndarray) -> jnp.ndarray:
        """[x | motif_0 | motif_1 | ...] per node — the same layout the
        sequential loop's jnp.concatenate produces."""
        G, n, f = outs.shape
        return jnp.concatenate(
            [x, outs.transpose(1, 0, 2).reshape(n, G * f)], axis=1)
