"""MagNetConv: Chebyshev filter over the scaled magnetic Laplacian.

TPU-first redesign of reference nn/directed/MagNetConv.py:13-257.

Key observation exploited here: the reference runs 4 "streams"
(real.real, imag.imag, imag.real, real.imag) but streams (real.real,
imag.real) and (imag.imag, real.imag) are computed from identical inputs
with identical operators (MagNetConv.py:196-240), so the true math is two
independent Chebyshev recurrences:

    S1_k = T_k(L_re) x_re      S2_k = T_k(L_im) x_im
    out_re = sum_k (S1_k - S2_k) W_k + b
    out_im = sum_k (S1_k + S2_k) W_k + b

This implementation therefore runs 2 SpMMs per Chebyshev step instead of
the reference's 4 propagates, and fuses the K+1 weight applications into
one [K+1, N, F] x [K+1, F, F'] einsum that the MXU executes as a single
batched matmul — numerically identical to the reference (allclose).

The scaled operators L_hat = 2L/lambda_max - I arrive as a frozen
(P_re, P_im) Propagator pair (spectral.magnet_propagators), or as a
MagneticTemplate when the phase q is trainable, in which case they are
rebuilt inside jit with elementwise math (spectral.template_propagators).
"""
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from ..inits import glorot, zeros
from ...ops.spmm import DualPropagator, Propagator, dual_spmm_stacked
from ...spectral.magnetic import (
    MagneticPair,
    MagneticTemplate,
    template_propagators,
)


def chebyshev_stack(P: Propagator, x: jnp.ndarray, K: int) -> jnp.ndarray:
    """[K+1, N, F] stack of Chebyshev polynomials T_k(P) x."""
    ts = [x]
    if K >= 1:
        ts.append(P(x))
    for _ in range(2, K + 1):
        ts.append(2.0 * P(ts[-1]) - ts[-2])
    return jnp.stack(ts)


def dual_chebyshev_stacks(D: DualPropagator, x_a, x_b, K: int,
                          apply=dual_spmm_stacked):
    """Both Chebyshev stacks in lockstep through the fused operator pair:
    one lane-stacked gather + scatter per order instead of two of each
    (the XLA row gather costs the same up to 128 lanes).  The recurrence
    state stays lane-stacked [N, 2F] throughout — the split back into the
    two streams happens once at the end, not once per order.

    ``apply`` selects the SpMM variant: the default treats the operator
    values as frozen; pass ops.spmm.dual_spmm_stacked_trainable when the
    values carry gradients (trainable q)."""
    f = x_a.shape[1]
    ts = [jnp.concatenate([x_a, x_b], axis=1)]
    if K >= 1:
        ts.append(apply(D, ts[0]))
    for _ in range(2, K + 1):
        ts.append(2.0 * apply(D, ts[-1]) - ts[-2])
    s = jnp.stack(ts)                      # [K+1, N, 2F]
    return s[:, :, :f], s[:, :, f:]


class MagNetConv(nn.Module):
    """Args mirror the reference layer; ``lap`` replaces (edge_index,
    edge_weight): pass a (P_re, P_im) Propagator pair, or a
    MagneticTemplate when ``trainable_q`` is True.
    """

    in_channels: int
    out_channels: int
    K: int
    q: float = 0.25
    trainable_q: bool = False
    normalization: Optional[str] = "sym"
    bias: bool = True

    @nn.compact
    def __call__(
        self,
        x_real: jnp.ndarray,
        x_imag: jnp.ndarray,
        lap: Union[Tuple[Propagator, Propagator], MagneticTemplate],
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.K > 0
        weight = self.param(
            "weight", glorot, (self.K + 1, self.in_channels, self.out_channels)
        )
        dual = None
        apply = dual_spmm_stacked
        if self.trainable_q:
            q = self.param("q", lambda k: jnp.full((1,), self.q))
            q = jnp.clip(q, 0.0, 0.25)  # reference clamps each forward (:141-142)
            if isinstance(lap, MagneticTemplate) and \
                    lap.mode in ("mxu", "mxu_sharded"):
                # flagship tier for trainable q: frozen scatter plan, only
                # the per-edge values depend on the traced q.  The fused
                # custom-VJP apply computes dq as an in-kernel SDDMM
                # (no extra row gathers over the frozen-q backward).
                from ...spectral.magnetic import template_dual_apply

                qv = q[0]
                dual = lap  # sentinel: apply closes over the template

                def apply(_D, v):
                    return template_dual_apply(lap, qv, v)

                P_re = P_im = None
            else:
                P_re, P_im = template_propagators(lap, q[0])
        else:
            P_re, P_im = lap
            if isinstance(lap, MagneticPair):
                dual = lap.dual

        if dual is not None:
            s1, s2 = dual_chebyshev_stacks(dual, x_real, x_imag, self.K,
                                           apply=apply)
        else:
            s1 = chebyshev_stack(P_re, x_real, self.K)  # [K+1, N, F]
            s2 = chebyshev_stack(P_im, x_imag, self.K)
        o1 = jnp.einsum("knf,kfo->no", s1, weight)
        o2 = jnp.einsum("knf,kfo->no", s2, weight)
        out_real = o1 - o2
        out_imag = o1 + o2

        if self.bias:
            b = self.param("bias", zeros, (self.out_channels,))
            out_real = out_real + b
            out_imag = out_imag + b
        return out_real, out_imag
