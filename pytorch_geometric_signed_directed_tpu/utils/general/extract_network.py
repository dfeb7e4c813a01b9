"""Largest weakly-connected component + iterative low-degree pruning.

Reference: utils/general/extract_network.py:9-57.  Pure scipy/numpy — the
networkx graph round-trips of the reference are replaced by sparse
component labelling and degree masks.
"""
from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp


def extract_network(A: sp.spmatrix, labels: Optional[np.ndarray] = None,
                    lowest_degree: int = 2, max_iter: int = 10
                    ) -> Tuple[sp.spmatrix, Optional[np.ndarray]]:
    A = A.tocsr()
    n_comp, comp = sp.csgraph.connected_components(A, directed=True,
                                                   connection="weak")
    sizes = np.bincount(comp, minlength=n_comp)
    keep = np.nonzero(comp == sizes.argmax())[0]
    A_new = A[keep][:, keep]
    labels = np.asarray(labels)[keep] if labels is not None else None

    iter_num = 0
    while iter_num < max_iter:
        iter_num += 1
        # total (in + out) unweighted degree, like nx.DiGraph.degree
        bin_ = A_new.copy()
        bin_.data = np.ones_like(bin_.data)
        deg = np.asarray(bin_.sum(0)).ravel() + np.asarray(bin_.sum(1)).ravel()
        mask = deg >= lowest_degree
        if mask.all():
            break
        if not mask.any():
            lowest_degree -= 1
            print("Nothing to keep, reducing lowest_degree by one to be "
                  f"{lowest_degree}!")
            continue
        A_new = A_new[mask][:, mask]
        if labels is not None:
            labels = labels[mask]
    return A_new, labels
