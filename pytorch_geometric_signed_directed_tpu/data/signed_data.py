"""SignedData: container for homogeneous signed graphs.

Reference: data/signed/SignedData.py:28-314.  Plain numpy/scipy container
(no torch Data dependency): edge lists and features are numpy; the jitted
training code converts to device arrays via the graph/ops builders.
"""
from typing import Optional, Tuple, Union

import numpy as np
import scipy.sparse as sp

from ..spectral.features import (
    signed_laplacian_eig_features,
    spectral_adjacency_reg_features,
)
from ..utils.general.node_split import node_class_split
from ..utils.general.link_split import link_class_split


class SignedData:
    def __init__(self, x=None, edge_index=None, edge_attr=None,
                 edge_weight=None, y=None, pos=None,
                 A: Union[Tuple[sp.spmatrix, sp.spmatrix], sp.spmatrix,
                          None] = None,
                 init_data=None, **kwargs):
        self.x = np.asarray(x) if x is not None else None
        self.y = np.asarray(y) if y is not None else None
        self.edge_attr = edge_attr
        self.pos = pos
        for k, v in kwargs.items():
            setattr(self, k, v)
        if A is None:
            edge_index = np.asarray(edge_index)
            n = int(edge_index.max()) + 1 if edge_index.size else 0
            if edge_weight is None:
                edge_weight = np.ones(edge_index.shape[1], np.float32)
            A = sp.coo_matrix((np.asarray(edge_weight),
                               (edge_index[0], edge_index[1])),
                              shape=(n, n))
        elif isinstance(A, tuple):
            A = A[0] - A[1]
        self.A = A.tocoo()
        self.edge_weight = np.asarray(self.A.data, np.float32)
        self.edge_index = np.asarray(self.A.nonzero(), np.int64)
        self.num_nodes = self.A.shape[0]
        if init_data is not None:
            self.inherit_attributes(init_data)

    def separate_positive_negative(self):
        ind = self.edge_weight > 0
        self.edge_index_p = self.edge_index[:, ind]
        self.edge_weight_p = self.edge_weight[ind]
        ind = self.edge_weight < 0
        self.edge_index_n = self.edge_index[:, ind]
        self.edge_weight_n = -self.edge_weight[ind]
        n = self.num_nodes
        self.A_p = sp.coo_matrix(
            (self.edge_weight_p, (self.edge_index_p[0], self.edge_index_p[1])),
            shape=(n, n))
        self.A_n = sp.coo_matrix(
            (self.edge_weight_n, (self.edge_index_n[0], self.edge_index_n[1])),
            shape=(n, n))

    def clear_separate_attributes(self):
        for name in ("edge_index_p", "edge_index_n", "edge_weight_p",
                     "edge_weight_n", "A_p", "A_n"):
            delattr(self, name)

    @property
    def is_signed(self) -> bool:
        return bool(self.edge_weight.max() * self.edge_weight.min() < 0)

    @property
    def is_directed(self) -> bool:
        A = self.A.tocsr()
        return (A != A.T).nnz > 0

    @property
    def is_weighted(self) -> bool:
        self.separate_positive_negative()
        res = (self.edge_weight_p.max() != self.edge_weight_p.min()
               or self.edge_weight_n.max() != self.edge_weight_n.min())
        self.clear_separate_attributes()
        return bool(res)

    def to_unweighted(self):
        self.edge_weight = np.sign(self.edge_weight).astype(np.float32)
        n = self.num_nodes
        self.A = sp.coo_matrix(
            (self.edge_weight, (self.edge_index[0], self.edge_index[1])),
            shape=(n, n))
        if hasattr(self, "edge_weight_p"):
            self.separate_positive_negative()

    def set_signed_Laplacian_features(self, k: int = 2):
        self.separate_positive_negative()
        self.x = signed_laplacian_eig_features(self.A_p, self.A_n, k)
        self.clear_separate_attributes()

    def set_spectral_adjacency_reg_features(self, k: int = 2,
                                            normalization=None, tau_p=None,
                                            tau_n=None, eigens=None, mi=None):
        self.separate_positive_negative()
        self.x = spectral_adjacency_reg_features(
            self.A_p, self.A_n, k, normalization, tau_p, tau_n, eigens, mi)
        self.clear_separate_attributes()

    def inherit_attributes(self, data):
        src = data.__dict__ if not isinstance(data, dict) else data
        for k, v in src.items():
            if not hasattr(self, k) or getattr(self, k) is None:
                setattr(self, k, v)

    def node_split(self, train_size=None, val_size=None, test_size=None,
                   seed_size=None, train_size_per_class=None,
                   val_size_per_class=None, test_size_per_class=None,
                   seed_size_per_class=None, seed=None, data_split: int = 2):
        node_class_split(
            self, train_size=train_size, val_size=val_size,
            test_size=test_size, seed_size=seed_size,
            train_size_per_class=train_size_per_class,
            val_size_per_class=val_size_per_class,
            test_size_per_class=test_size_per_class,
            seed_size_per_class=seed_size_per_class, seed=seed,
            data_split=data_split)

    def link_split(self, size=None, splits: int = 2, prob_test: float = 0.15,
                   prob_val: float = 0.05, task: str = "sign", seed: int = 0,
                   ratio: float = 1.0, maintain_connect: bool = False,
                   device=None) -> dict:
        return link_class_split(self, size, splits, prob_test, prob_val,
                                task, seed, maintain_connect, ratio, device)
