"""DiGCN: directed GCN over precomputed PPR adjacencies (+ inception).

Reference: nn/directed/DiGCNConv.py:7-98, DiGCN_node_classification.py:7-46,
DiGCN_link_prediction.py:8-52, DiGCN_Inception_Block.py:9-47,
DiGCN_Inception_Block_node_classification.py:9-73, ..._link_prediction.py:10-80.

The normalized appr / 2nd-order adjacencies (spectral.appr_directed_adj,
spectral.second_directed_adj) arrive as frozen Propagators built with
graph.norm_propagator(flow='source_to_target').
"""
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator


class DiGCNConv(nn.Module):
    """x @ W -> propagate -> + bias (reference order, DiGCNConv.py:81-95)."""

    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, P: Propagator) -> jnp.ndarray:
        x = nn.Dense(self.out_channels, use_bias=False)(x)
        out = P(x)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,))
        return out


class DiGCN_node_classification(nn.Module):
    """DiGCN node classification (NeurIPS'20): 2 DiGCNConv layers over the
    precomputed appr adjacency, dropout, log_softmax.

    Reference: nn/directed/DiGCN_node_classification.py:7-46.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, P: Propagator, training: bool = False):
        x = nn.relu(DiGCNConv(self.hidden)(x, P))
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = DiGCNConv(self.label_dim)(x, P)
        return nn.log_softmax(x, axis=1)


class DiGCN_link_prediction(nn.Module):
    """DiGCN link prediction: 2 DiGCNConv layers + query-edge concat ->
    Dense(2*hidden).

    Reference: nn/directed/DiGCN_link_prediction.py:8-52.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, P: Propagator, query_edges, training: bool = False):
        x = nn.relu(DiGCNConv(self.hidden)(x, P))
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.relu(DiGCNConv(self.hidden)(x, P))
        x = jnp.concatenate(
            [x[query_edges[:, 0]], x[query_edges[:, 1]]], axis=-1)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)


class DiGCN_Inception_Block(nn.Module):
    """x0 = Linear(x); x1 = conv(x, appr-adj); x2 = conv(x, 2nd-order adj)."""

    out_dim: int

    @nn.compact
    def __call__(self, x, P1: Propagator, P2: Propagator):
        x0 = nn.Dense(self.out_dim)(x)
        x1 = DiGCNConv(self.out_dim)(x, P1)
        x2 = DiGCNConv(self.out_dim)(x, P2)
        return x0, x1, x2


class DiGCN_Inception_Block_node_classification(nn.Module):
    """DiGCN inception node classification: 3 inception blocks with
    per-branch dropout and sum fusion x0+x1+x2.

    Reference: nn/directed/DiGCN_Inception_Block_node_classification.py:9-73.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, features, P1: Propagator, P2: Propagator,
                 training: bool = False):
        def drop(v):
            return nn.Dropout(self.dropout, deterministic=not training)(v)

        x = features
        for dim, last in ((self.hidden, False), (self.hidden, False),
                          (self.label_dim, True)):
            x0, x1, x2 = DiGCN_Inception_Block(dim)(x, P1, P2)
            x = drop(x0) + drop(x1) + drop(x2)
            if not last:
                x = drop(x)
        return nn.log_softmax(x, axis=1)


class DiGCN_Inception_Block_link_prediction(nn.Module):
    """DiGCN inception link prediction: 3 inception blocks, sum fusion,
    query-edge concat head.

    Reference: nn/directed/DiGCN_Inception_Block_link_prediction.py:10-80.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, features, P1: Propagator, P2: Propagator, query_edges,
                 training: bool = False):
        def drop(v):
            return nn.Dropout(self.dropout, deterministic=not training)(v)

        x = features
        for _ in range(2):
            x0, x1, x2 = DiGCN_Inception_Block(self.hidden)(x, P1, P2)
            x = drop(x0) + drop(x1) + drop(x2)
            x = drop(x)
        x0, x1, x2 = DiGCN_Inception_Block(self.hidden)(x, P1, P2)
        x = drop(x0) + drop(x1) + drop(x2)
        x = jnp.concatenate(
            [x[query_edges[:, 0]], x[query_edges[:, 1]]], axis=-1)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)
