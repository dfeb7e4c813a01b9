"""SiGAT: signed graph attention network over 38 motif graphs.

Reference: nn/signed/SiGAT.py:11-203.  Motif adjacency extraction is
vectorized host-side (motifs.sigat_edge_lists); each motif graph gets its
own GATConv; embeddings concat + MLP; loss = Link_Sign_Product_Loss.
"""
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .gat_conv import GATConv, gat_graph
from .motif_stack import MotifGATStack, MotifStackGraph, build_motif_stack
from .motifs import sigat_edge_lists
from .sgcn import split_signed_edges
from ...spectral.features import create_spectral_features
from ...utils.signed.link_sign_loss import link_sign_product_loss

_kaiming = nn.initializers.kaiming_normal()


def prepare_sigat_inputs(node_num: int, edge_index_s, in_dim: int = 20,
                         init_emb: Optional[np.ndarray] = None,
                         fused: bool = False):
    """Host-side setup: spectral init embedding + 38 motif AttnGraphs.

    fused=True collapses the 38 motif graphs into one MotifStackGraph
    (single gather/scatter over a 38*N row space — see motif_stack.py);
    fused=False keeps the per-motif list (required by the sharded
    path, parallel.shard_attention_graphs)."""
    pos_edge_index, neg_edge_index = split_signed_edges(edge_index_s)
    if init_emb is None:
        init_emb = create_spectral_features(pos_edge_index, neg_edge_index,
                                            node_num, in_dim)
    edge_lists = sigat_edge_lists(edge_index_s, node_num)
    if fused:
        graphs = build_motif_stack(edge_lists, node_num)
    else:
        graphs = [gat_graph(e, node_num) for e in edge_lists]
    return pos_edge_index, neg_edge_index, init_emb, graphs


class SiGAT(nn.Module):
    """SiGAT (ICANN'19): one GAT per motif graph (38 motif-derived edge
    lists) -> concat -> MLP; loss = Link_Sign_Product_Loss.

    Reference: nn/signed/SiGAT.py:11-203 (motif lists :136-185).
    """

    node_num: int
    num_graphs: int = 38
    in_dim: int = 20
    out_dim: int = 20
    init_emb_grad: bool = True
    init_emb: Optional[np.ndarray] = None

    def setup(self):
        if self.init_emb_grad:
            self.x = self.param("x", lambda k: jnp.asarray(self.init_emb))
        else:
            self.x = jnp.asarray(self.init_emb)
        self.aggs = [GATConv(self.out_dim, name=f"agg_{i}")
                     for i in range(self.num_graphs)]
        self.agg_stack = MotifGATStack(self.out_dim, self.num_graphs,
                                       name="agg_stack")
        self.mlp1 = nn.Dense(self.out_dim, kernel_init=_kaiming,
                             bias_init=nn.initializers.constant(0.01))
        self.mlp2 = nn.Dense(self.out_dim, kernel_init=_kaiming,
                             bias_init=nn.initializers.constant(0.01))

    def __call__(self, graphs) -> jnp.ndarray:
        x = self.x
        if isinstance(graphs, MotifStackGraph):
            combined = MotifGATStack.concat(x, self.agg_stack(x, graphs))
        else:
            feats = [x]
            for agg, g in zip(self.aggs, graphs):
                feats.append(agg(x, g))
            combined = jnp.concatenate(feats, axis=1)
        return self.mlp2(jnp.tanh(self.mlp1(combined)))

    def loss(self, graphs, pos_edge_index, neg_edge_index):
        z = self(graphs)
        return link_sign_product_loss(z, pos_edge_index, neg_edge_index)
