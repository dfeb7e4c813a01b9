"""DIGRAC probabilistic imbalance loss — vectorized, jit-safe.

Reference: utils/directed/prob_imbalance_loss.py:7-117.  The reference loops
over K(K-1)/2 cluster pairs with .item() host syncs; here the pairwise flow
matrix W = P^T A P is one matmul chain and the thresholding (sort / std /
naive) is mask arithmetic, so the whole loss jits.
"""
from typing import Optional, Union

import numpy as np
import jax.numpy as jnp


class Prob_Imbalance_Loss:
    """F: either an int (number of pairwise scores to keep under 'sort') or
    the meta-graph adjacency, from which sel = #{i<j : F_ij + F_ji > 0}."""

    def __init__(self, F: Optional[Union[int, np.ndarray]] = None):
        if isinstance(F, int):
            self.sel = F
        elif F is not None:
            K = F.shape[0]
            self.sel = 0
            for i in range(K - 1):
                for j in range(i + 1, K):
                    if (F[i, j] + F[j, i]) > 0:
                        self.sel += 1
        else:
            self.sel = None

    def __call__(self, P: jnp.ndarray, A, K: int,
                 normalization: str = "vol_sum",
                 threshold: str = "sort") -> jnp.ndarray:
        assert normalization in ("vol_sum", "vol_min", "vol_max", "plain"), \
            "Please input the correct normalization method name!"
        assert threshold in ("sort", "std", "naive"), \
            "Please input the correct threshold method name!"
        eps = 1e-8
        # A: dense [N, N] array, a (P_A, P_AT) pair of Propagators for
        # the sparse tiers (the transpose is needed for the volumes), or
        # a fused union-edge-set DualPropagator
        # (graph.adj_dual_propagator) computing [A·P | A^T·P] in ONE
        # gather + scatter — half the passes of the pair at giant scale.
        from ...ops.spmm import DualPropagator, dual_spmm_stacked

        if isinstance(A, tuple):
            P_A, P_AT = A
            AP = P_A(P)
            ATP = P_AT(P)
        elif isinstance(A, DualPropagator):
            k = P.shape[1]
            stacked = dual_spmm_stacked(A, jnp.concatenate([P, P], axis=1))
            AP, ATP = stacked[:, :k], stacked[:, k:]
        else:
            A = jnp.asarray(A)
            AP = A @ P
            ATP = A.T @ P
        vol = jnp.sum(AP + ATP, axis=0)  # [K]
        second_max_vol = jnp.sort(vol)[-2] + eps
        W = P.T @ AP  # [K, K] pairwise flows: W[k, l] = P_k^T A P_l

        iu, ju = np.triu_indices(K, k=1)
        w_kl = W[iu, ju]
        w_lk = W[ju, iu]
        diff = jnp.abs(w_kl - w_lk)
        denom_pair = w_kl + w_lk

        if normalization == "vol_sum":
            curr = diff / (vol[iu] + vol[ju] + eps) * 2
        elif normalization == "vol_min":
            curr = diff / (denom_pair + eps) * jnp.minimum(
                vol[iu], vol[ju]) / second_max_vol
        elif normalization == "vol_max":
            curr = diff / (jnp.maximum(vol[iu], vol[ju]) + eps)
        else:  # plain
            curr = diff / (denom_pair + eps)

        nonzero = diff != 0
        curr = jnp.where(nonzero, curr, 0.0)

        if threshold == "sort":
            sel = int(self.sel)
            top = jnp.sort(curr)[::-1][:sel]
            return 1.0 - jnp.sum(top) / sel
        if threshold == "naive":
            cnt = jnp.sum(nonzero)
            return jnp.where(cnt > 0, 1.0 - jnp.sum(curr) / jnp.maximum(cnt, 1), 1.0)
        # 'std': keep pairs with (w_kl - w_lk)^2 - 9 (w_kl + w_lk) > 0;
        # fall back to the below-threshold mean when none pass.
        passing = nonzero & ((w_kl - w_lk) ** 2 - 9.0 * denom_pair > 0)
        n_pass = jnp.sum(passing)
        n_nz = jnp.sum(nonzero)
        mean_pass = jnp.sum(jnp.where(passing, curr, 0.0)) / jnp.maximum(n_pass, 1)
        mean_all = jnp.sum(curr) / jnp.maximum(n_nz, 1)
        return jnp.where(n_pass > 0, 1.0 - mean_pass,
                         jnp.where(n_nz > 0, 1.0 - mean_all, 1.0))
