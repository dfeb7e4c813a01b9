"""Class-conditional triplet hinge loss on inner products.

Reference: utils/general/triplet_loss.py:8-46.  Sampling happens host-side
(numpy) with static shapes; the hinge itself is jit-safe given the indices.
"""
from typing import Optional, Union

import numpy as np
import jax.numpy as jnp


def sample_triplets(y: np.ndarray, num_nodes: int, n_sample: int,
                    rng: Optional[np.random.Generator] = None):
    """Host-side sampler: per class, (same1, same2, different) index arrays
    stacked over classes — shape [nclass * n_sample_class] each."""
    rng = rng or np.random.default_rng()
    y = np.asarray(y)
    nclass = int(y.max() - y.min() + 1)
    n_sample_class = max(int(n_sample / nclass), 32)
    all_nodes = np.arange(num_nodes)
    i1, i2, idif = [], [], []
    for c in range(nclass):
        same = all_nodes[y == c]
        diff = all_nodes[y != c]
        if len(same) == 0 or len(diff) == 0:
            continue
        i1.append(rng.choice(same, n_sample_class, replace=True))
        i2.append(rng.choice(same, n_sample_class, replace=True))
        idif.append(rng.choice(diff, n_sample_class, replace=True))
    return (np.concatenate(i1), np.concatenate(i2), np.concatenate(idif),
            n_sample_class, nclass)


def triplet_loss_inner_product(Z: jnp.ndarray, i1, i2, idif,
                               n_sample_class: int, nclass: int,
                               thre: float = 0.1) -> jnp.ndarray:
    """Jit-safe hinge: same-class inner products should exceed
    different-class ones by ``thre``."""
    feats1 = Z[i1]
    feats2 = Z[i2]
    feats_dif = Z[idif]
    inner = jnp.sum(feats1 * (feats_dif - feats2), axis=1)
    dists = inner + thre
    loss = jnp.sum(jnp.where(dists > 0, dists, 0.0))
    return loss / (n_sample_class * nclass)


def triplet_loss_node_classification(y, Z: jnp.ndarray, n_sample: int,
                                     thre: float,
                                     rng: Optional[np.random.Generator] = None
                                     ) -> jnp.ndarray:
    """Drop-in equivalent of the reference function (host sampling + jax
    compute)."""
    i1, i2, idif, n_sample_class, nclass = sample_triplets(
        y, Z.shape[0], n_sample, rng)
    return triplet_loss_inner_product(Z, i1, i2, idif, n_sample_class,
                                      nclass, thre)


class Triplet_Loss_InnerProduct:
    """Callable wrapper mirroring the reference API name."""

    def __init__(self, n_sample: int, thre: float = 0.1):
        self.n_sample = n_sample
        self.thre = thre

    def __call__(self, y, Z):
        return triplet_loss_node_classification(y, Z, self.n_sample, self.thre)
