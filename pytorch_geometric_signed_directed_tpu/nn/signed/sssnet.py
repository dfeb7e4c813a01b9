"""SSSNET: semi-supervised signed network clustering + link prediction.

Reference: nn/signed/SSSNET_node_clustering.py:11-160 and
SSSNET_link_prediction.py:11-157.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .simpa import SIMPA
from ..normalize import l2_normalize
from ...ops.spmm import Propagator

_xavier_gain_1414 = nn.initializers.variance_scaling(2.0, "fan_avg", "uniform")


class _SSSNETTrunk(nn.Module):
    nfeat: int
    hidden: int
    hop: int
    directed: bool
    dropout: float = 0.5
    bias: bool = True

    @nn.compact
    def __call__(self, P_p, P_n, features, P_pt=None, P_nt=None,
                 training: bool = False):
        def mlp(x, name):
            x = nn.Dense(self.hidden, use_bias=False,
                         kernel_init=_xavier_gain_1414, name=f"{name}0")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            return nn.Dense(self.hidden, use_bias=False,
                            kernel_init=_xavier_gain_1414, name=f"{name}1")(x)

        simpa = SIMPA(self.hop, self.directed)
        if not self.directed:
            x_p = mlp(features, "w_p")
            x_n = mlp(features, "w_n")
            z = simpa(P_p, P_n, x_p, x_n)
        else:
            x_sp = mlp(features, "w_sp")
            x_sn = mlp(features, "w_sn")
            x_tp = mlp(features, "w_tp")
            x_tn = mlp(features, "w_tn")
            z = simpa(P_p, P_n, x_sp, x_sn, P_pt, P_nt, x_tp, x_tn)
        return z


class SSSNET_node_clustering(nn.Module):
    """SSSNET clustering (SDM'22): 2 (undirected) or 4 (directed) input
    MLPs -> SIMPA -> linear prob head; returns (normalized z, log-prob,
    preds, prob).

    Reference: nn/signed/SSSNET_node_clustering.py:11-160.
    """

    nfeat: int
    hidden: int
    nclass: int
    dropout: float = 0.5
    hop: int = 2
    fill_value: float = 0.5
    directed: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, P_p: Propagator, P_n: Propagator, features,
                 P_pt: Optional[Propagator] = None,
                 P_nt: Optional[Propagator] = None,
                 training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        z = _SSSNETTrunk(self.nfeat, self.hidden, self.hop, self.directed,
                         self.dropout, self.bias)(
            P_p, P_n, features, P_pt, P_nt, training)
        dim = (4 if self.directed else 2) * self.hidden
        W_prob = self.param("W_prob", _xavier_gain_1414, (dim, self.nclass))
        output = z @ W_prob
        if self.bias:
            output = output + self.param("bias", nn.initializers.zeros,
                                         (self.nclass,))
        predictions_cluster = jnp.argmax(output, axis=1)
        prob = jax.nn.softmax(output, axis=1)
        log_prob = jax.nn.log_softmax(output, axis=1)
        z_norm = l2_normalize(z)
        return z_norm, log_prob, predictions_cluster, prob


class SSSNET_link_prediction(nn.Module):
    """SSSNET link prediction: same trunk, query-edge concat ->
    W_prob(4* or 8*hidden).

    Reference: nn/signed/SSSNET_link_prediction.py:11-157.
    """

    nfeat: int
    hidden: int
    nclass: int
    dropout: float = 0.5
    hop: int = 2
    fill_value: float = 0.5
    directed: bool = False
    bias: bool = True

    @nn.compact
    def __call__(self, P_p: Propagator, P_n: Propagator, features,
                 query_edges,
                 P_pt: Optional[Propagator] = None,
                 P_nt: Optional[Propagator] = None,
                 training: bool = False) -> jnp.ndarray:
        z = _SSSNETTrunk(self.nfeat, self.hidden, self.hop, self.directed,
                         self.dropout, self.bias)(
            P_p, P_n, features, P_pt, P_nt, training)
        x = jnp.concatenate([z[query_edges[:, 0]], z[query_edges[:, 1]]],
                            axis=-1)
        dim = (8 if self.directed else 4) * self.hidden
        W_prob = self.param("W_prob", _xavier_gain_1414, (dim, self.nclass))
        output = x @ W_prob
        if self.bias:
            output = output + self.param("bias", nn.initializers.zeros,
                                         (self.nclass,))
        return jax.nn.log_softmax(output, axis=1)
