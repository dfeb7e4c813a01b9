"""SIMPA: signed mixed-path aggregation.

Reference: nn/signed/SIMPA.py:10-144.  The four rw-normalized walk
operators (pos/neg x source/target; graph.rw_norm_propagator with
fill_value for pos and 0.0 for neg) arrive as frozen Propagators.
"""
from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator


class SIMPA(nn.Module):
    """hop-weighted positive walks + 'enemy' paths A_p^a A_n A_p^h x_n with
    hop(hop+1)/2 negative terms (reference :77-94); the directed variant
    runs source and target streams and concatenates 4*dim features."""

    hop: int
    directed: bool = False

    def _aggregate(self, x_p, x_n, P_p: Propagator, P_n: Propagator,
                   w_p, w_n):
        hop_p = self.hop + 1
        feat_p = w_p[0] * x_p
        feat_n = jnp.zeros_like(feat_p)
        curr_p = x_p
        curr_n_aux = x_n
        j = 0
        for h in range(hop_p):
            if h > 0:
                curr_p = P_p(curr_p)
                curr_n_aux = P_p(curr_n_aux)
                feat_p = feat_p + w_p[h] * curr_p
            if h != hop_p - 1:
                curr_n = P_n(curr_n_aux)
                feat_n = feat_n + w_n[j] * curr_n
                j += 1
                for _ in range(hop_p - 2 - h):
                    curr_n = P_p(curr_n)
                    feat_n = feat_n + w_n[j] * curr_n
                    j += 1
        return feat_p, feat_n

    @nn.compact
    def __call__(self, P_p: Propagator, P_n: Propagator,
                 x_p, x_n,
                 P_pt: Optional[Propagator] = None,
                 P_nt: Optional[Propagator] = None,
                 x_pt=None, x_nt=None) -> jnp.ndarray:
        hop_p = self.hop + 1
        hop_n = (1 + self.hop) * self.hop // 2
        if not self.directed:
            w_p = self.param("_w_p", nn.initializers.ones, (hop_p, 1))
            w_n = self.param("_w_n", nn.initializers.ones, (hop_n, 1))
            feat_p, feat_n = self._aggregate(x_p, x_n, P_p, P_n, w_p, w_n)
            return jnp.concatenate([feat_p, feat_n], axis=1)
        w_sp = self.param("_w_sp", nn.initializers.ones, (hop_p, 1))
        w_sn = self.param("_w_sn", nn.initializers.ones, (hop_n, 1))
        w_tp = self.param("_w_tp", nn.initializers.ones, (hop_p, 1))
        w_tn = self.param("_w_tn", nn.initializers.ones, (hop_n, 1))
        feat_sp, feat_sn = self._aggregate(x_p, x_n, P_p, P_n, w_sp, w_sn)
        feat_tp, feat_tn = self._aggregate(x_pt, x_nt, P_pt, P_nt, w_tp, w_tn)
        return jnp.concatenate([feat_sp, feat_sn, feat_tp, feat_tn], axis=1)
