"""SNEA: signed network embedding via attention.

Reference: nn/signed/SNEA.py:9-93 — SGCN scaffold + an extra Linear head,
lamb = 4 default, trainable input embedding by default.
"""
from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .snea_conv import SNEAConv, snea_graphs
from .sgcn import split_signed_edges
from ...spectral.features import create_spectral_features
from ...utils.signed.link_sign_loss import (
    Link_Sign_Entropy_Loss,
    sign_structure_loss,
)


def prepare_snea_inputs(node_num: int, edge_index_s, in_dim: int = 20,
                        init_emb: Optional[np.ndarray] = None):
    pos_edge_index, neg_edge_index = split_signed_edges(edge_index_s)
    if init_emb is None:
        init_emb = create_spectral_features(pos_edge_index, neg_edge_index,
                                            node_num, in_dim)
    graphs = snea_graphs(pos_edge_index, neg_edge_index, node_num)
    return pos_edge_index, neg_edge_index, init_emb, graphs


class SNEA(nn.Module):
    """SNEA model (AAAI'20): SGCN-style scaffold over SNEAConv layers with
    an extra Dense head; loss = Link_Sign_Entropy + lamb *
    Sign_Structure (lamb=4 default).

    Reference: nn/signed/SNEA.py:9-93.
    """

    node_num: int
    in_dim: int = 20
    out_dim: int = 20
    layer_num: int = 2
    lamb: float = 4.0
    init_emb_grad: bool = True
    init_emb: Optional[np.ndarray] = None

    def setup(self):
        if self.init_emb_grad:
            self.x = self.param("x", lambda k: jnp.asarray(self.init_emb))
        else:
            self.x = jnp.asarray(self.init_emb)
        self.conv1 = SNEAConv(self.in_dim, self.out_dim // 2,
                              first_aggr=True)
        self.convs = [
            SNEAConv(self.out_dim // 2, self.out_dim // 2, first_aggr=False)
            for _ in range(self.layer_num - 1)
        ]
        self.weight = nn.Dense(self.out_dim)
        self.lsp_loss = Link_Sign_Entropy_Loss(self.out_dim)

    def __call__(self, graphs) -> jnp.ndarray:
        g_pos, g_neg, g_cat = graphs
        z = jnp.tanh(self.conv1(self.x, g_pos, g_neg, g_cat))
        for conv in self.convs:
            z = jnp.tanh(conv(z, g_pos, g_neg, g_cat))
        return jnp.tanh(self.weight(z))

    def loss(self, graphs, pos_edge_index, neg_edge_index,
             none_edge_index, pos_triplets, neg_triplets):
        """Use ``method=SNEA.loss`` for .init()."""
        z = self(graphs)
        nll = self.lsp_loss(z, pos_edge_index, neg_edge_index,
                            none_edge_index)
        structure = sign_structure_loss(z, pos_triplets, neg_triplets)
        return nll + self.lamb * structure
