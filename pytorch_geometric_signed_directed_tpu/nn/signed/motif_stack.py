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
from typing import List

import numpy as np
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from .snea_conv import (
    AttnGraph,
    attention_softmax_aggregate,
)
from ...ops.pallas.scatter_mxu import (
    build_scatter_plan,
    permute_edge_data,
)

_glorot = nn.initializers.xavier_uniform()


@struct.dataclass
class MotifStackGraph:
    """G motif graphs as one AttnGraph over a G*N row space."""

    g: AttnGraph                                   # num_nodes = G*N
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
    return MotifStackGraph(g=g, num_nodes=n, num_graphs=G)


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
        gg = stack.g
        src = jnp.minimum(gg.src, G * n - 1)
        dst = jnp.minimum(gg.dst, G * n - 1)
        logits = nn.leaky_relu(a_src[src] + a_dst[dst],
                               self.negative_slope)
        out = attention_softmax_aggregate(gg, logits, T[src])
        return out.reshape(G, n, f) + bias[:, None, :]

    @staticmethod
    def concat(x: jnp.ndarray, outs: jnp.ndarray) -> jnp.ndarray:
        """[x | motif_0 | motif_1 | ...] per node — the same layout the
        sequential loop's jnp.concatenate produces."""
        G, n, f = outs.shape
        return jnp.concatenate(
            [x, outs.transpose(1, 0, 2).reshape(n, G * f)], axis=1)
