"""SDGNN: signed directed GNN with motif attention + 3-part loss.

Reference: nn/signed/SDGNN.py:13-267.
"""
from typing import List, Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .gat_conv import GATConv, gat_graph
from .motif_stack import MotifGATStack, MotifStackGraph, build_motif_stack
from .motifs import sdgnn_edge_lists
from .sgcn import split_signed_edges
from ...spectral.features import create_spectral_features
from ...utils.signed.link_sign_loss import (
    Sign_Direction_Loss,
    Sign_Triangle_Loss,
    sign_product_entropy_loss,
)

_kaiming = nn.initializers.kaiming_normal()


def prepare_sdgnn_inputs(node_num: int, edge_index_s, in_dim: int = 20,
                         init_emb: Optional[np.ndarray] = None,
                         fused: bool = False):
    """Host-side setup: init embedding, 4 motif AttnGraphs, and the
    per-edge triangle weights for the pos/neg training edges.

    fused=True collapses the 4 motif graphs into one MotifStackGraph
    (see motif_stack.py); fused=False keeps the per-motif list
    (required by parallel.shard_attention_graphs)."""
    pos_edge_index, neg_edge_index = split_signed_edges(edge_index_s)
    if init_emb is None:
        init_emb = create_spectral_features(pos_edge_index, neg_edge_index,
                                            node_num, in_dim)
    edge_lists, tri_weight = sdgnn_edge_lists(edge_index_s, node_num)
    if fused:
        graphs = build_motif_stack(edge_lists, node_num)
    else:
        graphs = [gat_graph(e, node_num) for e in edge_lists]
    w_pos = np.asarray(
        tri_weight[pos_edge_index[0], pos_edge_index[1]]).ravel()
    w_neg = np.asarray(
        tri_weight[neg_edge_index[0], neg_edge_index[1]]).ravel()
    return (pos_edge_index, neg_edge_index, init_emb, graphs,
            w_pos.astype(np.float32), w_neg.astype(np.float32))


class SDRLayer(nn.Module):
    out_dim: int
    num_graphs: int = 4

    @nn.compact
    def __call__(self, x, graphs) -> jnp.ndarray:
        if isinstance(graphs, MotifStackGraph):
            outs = MotifGATStack(self.out_dim, graphs.num_graphs,
                                 name="agg_stack")(x, graphs)
            combined = MotifGATStack.concat(x, outs)
        else:
            feats = [x]
            for i, g in enumerate(graphs):
                feats.append(GATConv(self.out_dim, name=f"agg_{i}")(x, g))
            combined = jnp.concatenate(feats, axis=1)
        h = jnp.tanh(nn.Dense(self.out_dim, kernel_init=_kaiming)(combined))
        return nn.Dense(self.out_dim, kernel_init=_kaiming)(h)


class SDGNN(nn.Module):
    """SDGNN (AAAI'21): stacked SDRLayers (one GAT per motif graph + MLP)
    over 4 motif edge lists, with sign + direction + triangle losses.

    Reference: nn/signed/SDGNN.py:13-267.
    """

    node_num: int
    in_dim: int = 20
    out_dim: int = 20
    layer_num: int = 2
    lamb_d: float = 5.0
    lamb_t: float = 1.0
    init_emb_grad: bool = True
    init_emb: Optional[np.ndarray] = None

    def setup(self):
        if self.init_emb_grad:
            self.x = self.param("x", lambda k: jnp.asarray(self.init_emb))
        else:
            self.x = jnp.asarray(self.init_emb)
        self.layers = [SDRLayer(self.out_dim, name=f"SDRLayer_{i}")
                       for i in range(self.layer_num)]
        self.loss_direction = Sign_Direction_Loss(self.out_dim)
        self.loss_tri = Sign_Triangle_Loss(self.out_dim)

    def __call__(self, graphs) -> jnp.ndarray:
        x = self.x
        for layer in self.layers:
            x = layer(x, graphs)
        return x

    def loss(self, graphs, pos_edge_index, neg_edge_index,
             w_pos, w_neg):
        """Use ``method=SDGNN.loss`` for .init()."""
        z = self(graphs)
        loss_sign = sign_product_entropy_loss(z, pos_edge_index,
                                              neg_edge_index)
        loss_direction = self.loss_direction(z, pos_edge_index,
                                             neg_edge_index)
        loss_triangle = self.loss_tri(z, pos_edge_index, neg_edge_index,
                                      w_pos, w_neg)
        return loss_sign + self.lamb_d * loss_direction \
            + self.lamb_t * loss_triangle
