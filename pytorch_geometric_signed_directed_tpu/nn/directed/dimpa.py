"""DIMPA + DIGRAC: directed mixed-path aggregation clustering.

Reference: nn/directed/DIMPA.py:7-59, DIGRAC_node_clustering.py:10-89.

The two walk operators (source walks over A, target walks over A^T), each
row-normalized with self-loop fill (reference conv_norm_rw,
nn/general/conv_base.py:12-31), arrive as frozen Propagators built by
graph.rw_norm_propagator — one for edge_index and one for the reversed
edge_index, matching the reference's per-direction renormalization.
"""
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator
from ..normalize import l2_normalize

_xavier_gain_1414 = nn.initializers.variance_scaling(
    2.0, "fan_avg", "uniform")  # xavier_uniform with gain=1.414 (gain^2 = 2)


class DIMPA(nn.Module):
    """Hop-weighted sums of source walks A^h x_s and target walks (A^T)^h x_t
    with learnable scalar hop weights, concatenated."""

    hop: int

    @nn.compact
    def __call__(self, x_s, x_t, P_s, P_t=None):
        """P_s/P_t: the two rw-normalized walk Propagators, OR P_s a
        fused union-direction DualPropagator
        (graph.rw_norm_dual_propagator) with P_t=None — each hop then
        runs [P_s curr_s | P_t curr_t] as one gather + scatter."""
        from ...ops.spmm import DualPropagator, dual_spmm_stacked

        w_s = self.param("_w_s", nn.initializers.ones, (self.hop + 1, 1))
        w_t = self.param("_w_t", nn.initializers.ones, (self.hop + 1, 1))
        feat_s = w_s[0] * x_s
        feat_t = w_t[0] * x_t
        if isinstance(P_s, DualPropagator):
            f = x_s.shape[-1]
            curr = jnp.concatenate([x_s, x_t], axis=-1)
            for h in range(1, self.hop + 1):
                curr = dual_spmm_stacked(P_s, curr)
                feat_s = feat_s + w_s[h] * curr[..., :f]
                feat_t = feat_t + w_t[h] * curr[..., f:]
            return jnp.concatenate([feat_s, feat_t], axis=1)
        curr_s, curr_t = x_s, x_t
        for h in range(1, self.hop + 1):
            curr_s = P_s(curr_s)
            curr_t = P_t(curr_t)
            feat_s = feat_s + w_s[h] * curr_s
            feat_t = feat_t + w_t[h] * curr_t
        return jnp.concatenate([feat_s, feat_t], axis=1)


class DIGRAC_node_clustering(nn.Module):
    """DIGRAC clustering model (LoG'22): two 2-layer MLPs (source/target)
    -> DIMPA -> linear head; returns (normalized embedding, log-prob,
    argmax clusters, prob).

    Reference: nn/directed/DIGRAC_node_clustering.py:10-89.
    """

    num_features: int
    hidden: int
    nclass: int
    fill_value: float = 0.5
    dropout: float = 0.5
    hop: int = 2

    @nn.compact
    def __call__(self, P_s: Propagator, P_t: Propagator, features,
                 training: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        def mlp(x, name):
            x = nn.Dense(self.hidden, use_bias=False,
                         kernel_init=_xavier_gain_1414, name=f"{name}0")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
            return nn.Dense(self.hidden, use_bias=False,
                            kernel_init=_xavier_gain_1414, name=f"{name}1")(x)

        x_s = mlp(features, "w_s")
        x_t = mlp(features, "w_t")
        z = DIMPA(self.hop)(x_s, x_t, P_s, P_t)

        W_prob = self.param("W_prob", _xavier_gain_1414,
                            (2 * self.hidden, self.nclass))
        bias = self.param("bias", nn.initializers.zeros, (self.nclass,))
        output = z @ W_prob + bias
        predictions_cluster = jnp.argmax(output, axis=1)
        prob = jax.nn.softmax(output, axis=1)
        log_prob = jax.nn.log_softmax(output, axis=1)
        z_norm = l2_normalize(z)
        return z_norm, log_prob, predictions_cluster, prob
