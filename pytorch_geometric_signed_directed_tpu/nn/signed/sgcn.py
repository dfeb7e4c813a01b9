"""SGCN: signed GCN with trainable input embedding and composite loss.

Reference: nn/signed/SGCN.py:11-97.  The model "owns its graph": the
pos/neg mean Propagators are built once from the 3-column signed edge list
(see ``prepare_sgcn_inputs``), the input embedding is TSVD spectral features
unless given, and loss() = Link_Sign_Entropy_Loss + lamb * Sign_Structure_Loss
with host-presampled negatives.
"""
from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .sgcn_conv import SGCNConv
from ...graph import mean_propagator
from ...spectral.features import create_spectral_features
from ...utils.signed.link_sign_loss import (
    Link_Sign_Entropy_Loss,
    sign_structure_loss,
)


def split_signed_edges(edge_index_s: np.ndarray):
    """[M, 3] signed edge list -> (pos_edge_index [2, P], neg_edge_index)."""
    edge_index_s = np.asarray(edge_index_s)
    pos = edge_index_s[edge_index_s[:, 2] > 0][:, :2].T
    neg = edge_index_s[edge_index_s[:, 2] < 0][:, :2].T
    return pos.astype(np.int64), neg.astype(np.int64)


def sgcn_dual_propagator(pos_edge_index, neg_edge_index, node_num: int,
                         mode: str = "mxu"):
    """Fuse the two mean propagators into ONE operator over the union
    edge set: val_a = 1/deg_pos(dst) on positive edges (0 on negative),
    val_b symmetric.  [P_pos x_a | P_neg x_b] then runs as one gather +
    one scatter (dual_spmm_stacked), halving the apply count of every
    SGCN layer (first layer 2 -> 1, deep layers 4 -> 2).  Returns None
    where fusion buys nothing (dense tier)."""
    from ...ops.spmm import dual_propagator

    rp, cp = np.asarray(pos_edge_index[1]), np.asarray(pos_edge_index[0])
    rn, cn = np.asarray(neg_edge_index[1]), np.asarray(neg_edge_index[0])
    cntp = np.bincount(rp, minlength=node_num).astype(np.float64)
    cntp[cntp == 0] = 1.0
    cntn = np.bincount(rn, minlength=node_num).astype(np.float64)
    cntn[cntn == 0] = 1.0
    row = np.concatenate([rp, rn])
    col = np.concatenate([cp, cn])
    va = np.concatenate([1.0 / cntp[rp], np.zeros(len(rn))])
    vb = np.concatenate([np.zeros(len(rp)), 1.0 / cntn[rn]])
    return dual_propagator(row, col, va, vb, num_nodes=node_num,
                           mode=mode)


def prepare_sgcn_inputs(node_num: int, edge_index_s, in_dim: int = 64,
                        init_emb: Optional[np.ndarray] = None,
                        mode: str = "auto", fused: bool = False):
    """Host-side setup mirroring the reference constructor (:47-66).

    fused=True returns (pos, neg, emb, D, None) with D a union-edge-set
    DualPropagator (see sgcn_dual_propagator) instead of two separate
    mean propagators; SGCNConv dispatches on the type.  Falls back to
    the separate pair on tiers where fusion buys nothing."""
    pos_edge_index, neg_edge_index = split_signed_edges(edge_index_s)
    if init_emb is None:
        init_emb = create_spectral_features(pos_edge_index, neg_edge_index,
                                            node_num, in_dim)
    if fused:
        D = sgcn_dual_propagator(pos_edge_index, neg_edge_index, node_num,
                                 mode=mode if mode != "auto" else "mxu")
        if D is not None:
            return pos_edge_index, neg_edge_index, init_emb, D, None
    P_pos = mean_propagator(pos_edge_index, node_num, mode=mode)
    P_neg = mean_propagator(neg_edge_index, node_num, mode=mode)
    return pos_edge_index, neg_edge_index, init_emb, P_pos, P_neg


class SGCN(nn.Module):
    """SGCN (ICDM'18): balance-theory signed conv stack holding a trainable
    input embedding (TSVD spectral features by default); the model owns
    its graph (edges fixed at construction) and loss() combines
    Link_Sign_Entropy with lamb * Sign_Structure.

    Reference: nn/signed/SGCN.py:11-97.
    """

    node_num: int
    in_dim: int = 64
    out_dim: int = 64
    layer_num: int = 2
    lamb: float = 5.0
    norm_emb: bool = False
    init_emb_grad: bool = False
    init_emb: Optional[np.ndarray] = None  # [node_num, in_dim], host numpy

    def setup(self):
        if self.init_emb_grad:
            self.x = self.param("x", lambda k: jnp.asarray(self.init_emb))
        else:
            self.x = jnp.asarray(self.init_emb)
        self.conv1 = SGCNConv(self.in_dim, self.out_dim // 2,
                              first_aggr=True)
        self.convs = [
            SGCNConv(self.out_dim // 2, self.out_dim // 2, first_aggr=False,
                     norm_emb=self.norm_emb)
            for _ in range(self.layer_num - 1)
        ]
        self.lsp_loss = Link_Sign_Entropy_Loss(self.out_dim)

    def __call__(self, P_pos, P_neg) -> jnp.ndarray:
        z = jnp.tanh(self.conv1(self.x, P_pos, P_neg))
        for conv in self.convs:
            z = jnp.tanh(conv(z, P_pos, P_neg))
        return z

    def loss(self, P_pos, P_neg, pos_edge_index, neg_edge_index,
             none_edge_index, pos_triplets, neg_triplets):
        """nll + lamb * structure loss; sampling indices come from
        utils.signed.negative_sampling / structured_negative_sampling.
        Use ``method=SGCN.loss`` for .init() so the discriminator head's
        parameters are created too."""
        z = self(P_pos, P_neg)
        nll = self.lsp_loss(z, pos_edge_index, neg_edge_index,
                            none_edge_index)
        structure = sign_structure_loss(z, pos_triplets, neg_triplets)
        return nll + self.lamb * structure
