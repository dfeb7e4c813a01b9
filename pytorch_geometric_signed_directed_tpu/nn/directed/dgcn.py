"""DGCN: directed GCN with 2nd-order in/out proximity streams.

Reference: nn/directed/DGCNConv.py:11-103 (parameterless GCN propagation),
DGCN_node_classification.py:10-97, DGCN_link_prediction.py:10-96.

The three graphs (symmetrized A, 2nd-order in-A, 2nd-order out-A built by
graph.directed_features_in_out) arrive as three frozen gcn-normalized
Propagators; DGCNConv is then just operator application.
"""
from typing import Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator


class DGCNConv:
    """Parameterless GCN propagation: ``DGCNConv()(x, P)`` == ``P(x)``.

    The gcn_norm / caching of the reference layer lives in
    graph.gcn_norm_propagator (done once, host-side).
    """

    def __call__(self, x: jnp.ndarray, P: Propagator) -> jnp.ndarray:
        return P(x)


class _DGCNTrunk(nn.Module):
    num_features: int
    hidden: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, P_sym: Propagator, P_in: Propagator,
                 P_out: Propagator, training: bool = False):
        conv = DGCNConv()
        x = nn.Dense(self.hidden, use_bias=False)(x)
        bias1 = self.param("bias1", nn.initializers.zeros, (1, self.hidden))
        x = jnp.concatenate(
            [conv(x, P_sym) + bias1, conv(x, P_in) + bias1,
             conv(x, P_out) + bias1], axis=-1)
        x = nn.relu(x)

        x = nn.Dense(self.hidden, use_bias=False)(x)
        bias2 = self.param("bias2", nn.initializers.zeros, (1, self.hidden))
        x = jnp.concatenate(
            [conv(x, P_sym) + bias2, conv(x, P_in) + bias2,
             conv(x, P_out) + bias2], axis=-1)
        x = nn.relu(x)
        if self.dropout and self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return x


class DGCN_node_classification(nn.Module):
    """DGCN node classification: Dense -> 3-stream conv over (symmetrized
    A, 2nd-order in-A, 2nd-order out-A) with a shared parameter-free
    DGCNConv, concat x3 + bias, 2 rounds, Dense head.

    Reference: nn/directed/DGCN_node_classification.py:10-97.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: Optional[float] = 0.5

    @nn.compact
    def __call__(self, x, P_sym, P_in, P_out, training: bool = False):
        x = _DGCNTrunk(self.num_features, self.hidden, self.dropout or 0.0)(
            x, P_sym, P_in, P_out, training)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)


class DGCN_link_prediction(nn.Module):
    """DGCN link prediction: same 3-stream trunk, query-edge concat ->
    Dense(6*hidden).

    Reference: nn/directed/DGCN_link_prediction.py:10-96.
    """

    num_features: int
    hidden: int
    label_dim: int
    dropout: Optional[float] = 0.5

    @nn.compact
    def __call__(self, x, P_sym, P_in, P_out, query_edges,
                 training: bool = False):
        x = _DGCNTrunk(self.num_features, self.hidden, self.dropout or 0.0)(
            x, P_sym, P_in, P_out, training)
        x = jnp.concatenate(
            [x[query_edges[:, 0]], x[query_edges[:, 1]]], axis=-1)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)
