"""SGCNConv: balance-theory signed convolution.

Reference: nn/signed/SGCNConv.py:13-138.  The mean aggregations over the
positive / negative edge sets arrive as frozen mean Propagators
(graph.mean_propagator, flow source_to_target), so each layer is two
operator applications + dense mixes on the MXU.
"""
import jax.numpy as jnp
import flax.linen as nn

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
    def __call__(self, x: jnp.ndarray, P_pos, P_neg=None) -> jnp.ndarray:
        """P_pos/P_neg: the two mean Propagators, OR P_pos a fused
        union-edge-set DualPropagator (sgcn.sgcn_dual_propagator) with
        P_neg=None — each layer then runs half the operator applies
        ([P_pos x_a | P_neg x_b] as one gather + scatter)."""
        from ...ops.spmm import DualPropagator, dual_spmm_stacked

        lin_b = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_b")
        lin_u = nn.Dense(self.out_dim, use_bias=self.use_bias, name="lin_u")
        dual = P_pos if isinstance(P_pos, DualPropagator) else None
        if self.first_aggr:
            if dual is not None:
                y = dual_spmm_stacked(dual, jnp.concatenate([x, x],
                                                            axis=-1))
                f = x.shape[-1]
                px, nx = y[..., :f], y[..., f:]
            else:
                px, nx = P_pos(x), P_neg(x)
            out_b = lin_b(jnp.concatenate([px, x], axis=-1))
            out_u = lin_u(jnp.concatenate([nx, x], axis=-1))
            out = jnp.concatenate([out_b, out_u], axis=-1)
        else:
            F_in = self.in_dim
            x_b, x_u = x[..., :F_in], x[..., F_in:]
            if dual is not None:
                y1 = dual_spmm_stacked(dual, jnp.concatenate([x_b, x_u],
                                                             axis=-1))
                y2 = dual_spmm_stacked(dual, jnp.concatenate([x_u, x_b],
                                                             axis=-1))
                p_b, n_u = y1[..., :F_in], y1[..., F_in:]
                p_u, n_b = y2[..., :F_in], y2[..., F_in:]
            else:
                p_b, n_u = P_pos(x_b), P_neg(x_u)
                p_u, n_b = P_pos(x_u), P_neg(x_b)
            out_b = lin_b(jnp.concatenate([p_b, n_u, x_b], axis=-1))
            out_u = lin_u(jnp.concatenate([p_u, n_b, x_u], axis=-1))
            out = jnp.concatenate([out_b, out_u], axis=-1)
        if self.norm_emb:
            out = l2_normalize(out)
        return out
