"""SGCNConv: balance-theory signed convolution.

Reference: nn/signed/SGCNConv.py:13-138.  The mean aggregations over the
positive / negative edge sets arrive as frozen mean Propagators
(graph.mean_propagator, flow source_to_target), so each layer is two
operator applications + dense mixes on the MXU.
"""
import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator
from ..normalize import l2_normalize


class SGCNConv(nn.Module):
    """first_aggr=True: separate balanced/unbalanced channels from scratch;
    otherwise cross-mix the pos/neg halves of the feature (reference
    :100-123)."""

    in_dim: int
    out_dim: int
    first_aggr: bool
    use_bias: bool = True
    norm_emb: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, P_pos: Propagator,
                 P_neg: Propagator) -> jnp.ndarray:
        lin_b = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_b")
        lin_u = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_u")
        if self.first_aggr:
            out_b = lin_b(jnp.concatenate([P_pos(x), x], axis=-1))
            out_u = lin_u(jnp.concatenate([P_neg(x), x], axis=-1))
            out = jnp.concatenate([out_b, out_u], axis=-1)
        else:
            F_in = self.in_dim
            x_b, x_u = x[..., :F_in], x[..., F_in:]
            out_b = lin_b(jnp.concatenate(
                [P_pos(x_b), P_neg(x_u), x_b], axis=-1))
            out_u = lin_u(jnp.concatenate(
                [P_pos(x_u), P_neg(x_b), x_u], axis=-1))
            out = jnp.concatenate([out_b, out_u], axis=-1)
        if self.norm_emb:
            out = l2_normalize(out)
        return out
