"""Data containers, generators and split semantics.

Mirrors the reference's signed_data/directed_data test strategy
(test/signed_data_test.py, test/directed_data_test.py): every (edge, label)
pair in a link split must be consistent with the adjacency matrix, node
masks must be disjoint and complete, and the SBM generators must produce
the advertised shapes/statistics.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from pytorch_geometric_signed_directed_tpu.data import (
    DSBM,
    SDSBM,
    SSBM,
    DirectedData,
    SignedData,
    polarized_SSBM,
)
from pytorch_geometric_signed_directed_tpu.utils import (
    extract_network,
    link_class_split,
    meta_graph_generation,
    node_class_split,
)


class TestGenerators:
    def test_ssbm_shapes(self):
        (A_p, A_n), labels = SSBM(200, 4, 0.1, 0.1,
                                  rng=np.random.default_rng(0))
        assert A_p.shape == (200, 200) and A_n.shape == (200, 200)
        assert labels.shape == (200,) and labels.max() == 3
        # undirected parts
        assert (A_p != A_p.T).nnz == 0
        assert (A_n != A_n.T).nnz == 0
        # most within-community edges positive at low noise
        P = A_p.tocoo()
        within_pos = (labels[P.row] == labels[P.col]).sum()
        N = A_n.tocoo()
        within_neg = (labels[N.row] == labels[N.col]).sum()
        assert within_pos > 3 * within_neg

    def test_ssbm_size_ratio(self):
        _, labels = SSBM(300, 3, 0.1, 0.05, size_ratio=3,
                         rng=np.random.default_rng(1))
        counts = np.bincount(labels)
        assert counts.max() > 2 * counts.min()

    def test_dsbm(self):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        A, labels = DSBM(150, 3, 0.5, F, rng=np.random.default_rng(2))
        assert A.shape == (150, 150)
        assert labels.shape == (150,)
        assert (A.data >= 0).all()
        assert A.diagonal().sum() == 0  # no self loops

    def test_sdsbm_signs(self):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        F[0, 1] = -F[0, 1]
        A, labels = SDSBM(150, 3, 0.5, F, eta=0.0,
                          rng=np.random.default_rng(3))
        A = A.tocoo()
        # edges from cluster 0 to cluster 1 must be negative (eta=0)
        m = (labels[A.row] == 0) & (labels[A.col] == 1)
        assert m.sum() > 0 and (A.data[m] < 0).all()

    def test_polarized_ssbm(self):
        (A_p, A_n), labels, groups = polarized_SSBM(
            total_n=200, num_com=2, N=50, K=2, p=0.1, eta=0.1,
            rng=np.random.default_rng(4))
        n = A_p.shape[0]
        assert A_n.shape == (n, n)
        assert len(labels) == n and len(groups) == n
        assert groups.max() == 2
        assert labels.max() <= 4

    def test_meta_graph_styles(self):
        for style in ("cyclic", "path", "complete", "star", "multipartite"):
            for K in (4, 5):
                for ambient in (False, True):
                    F = meta_graph_generation(style, K, 0.05, ambient)
                    assert F.shape == (K, K)
                    assert ((F >= 0) & (F <= 1)).all()

    def test_extract_network(self):
        A = sp.lil_matrix((10, 10))
        for i in range(6):
            A[i, (i + 1) % 6] = 1
            A[(i + 1) % 6, i] = 1
        A[7, 8] = 1  # small separate component + isolated 9
        labels = np.arange(10)
        A2, l2 = extract_network(A.tocsr(), labels)
        assert A2.shape == (6, 6)
        assert (l2 == np.arange(6)).all()


class TestDataClasses:
    def make_signed(self, seed=0):
        (A_p, A_n), labels = SSBM(80, 3, 0.2, 0.1,
                                  rng=np.random.default_rng(seed))
        return SignedData(A=(A_p, A_n), y=labels)

    def test_signed_attrs(self):
        d = self.make_signed()
        assert d.is_signed
        d.separate_positive_negative()
        assert (d.edge_weight_p > 0).all() and (d.edge_weight_n > 0).all()
        assert d.A_p.nnz + d.A_n.nnz == d.edge_index.shape[1]
        np.testing.assert_allclose(
            (d.A_p - d.A_n).toarray(), d.A.toarray())
        d.clear_separate_attributes()
        assert not hasattr(d, "A_p")

    def test_signed_features(self):
        d = self.make_signed()
        d.set_spectral_adjacency_reg_features(k=3)
        assert d.x.shape == (d.num_nodes, 3)
        d.set_signed_Laplacian_features(k=2)
        assert d.x.shape == (d.num_nodes, 2)

    def test_directed_data(self):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        A, labels = DSBM(100, 3, 0.5, F, rng=np.random.default_rng(5))
        d = DirectedData(A=A, y=labels)
        assert d.is_directed
        d.set_hermitian_features(k=2)
        assert d.x.shape == (100, 4)


class TestNodeSplit:
    def test_masks_disjoint_complete(self):
        d = TestDataClasses().make_signed()
        node_class_split(d, train_size_per_class=0.5, val_size_per_class=0.2,
                         data_split=3)
        assert d.train_mask.shape == (d.num_nodes, 3)
        total = (d.train_mask.astype(int) + d.val_mask.astype(int)
                 + d.test_mask.astype(int))
        assert total.max() == 1  # disjoint
        assert (total.sum(0) == d.num_nodes).all()  # complete

    def test_int_sizes(self):
        d = TestDataClasses().make_signed(seed=2)
        node_class_split(d, train_size=30, val_size=20, test_size=25,
                         data_split=2)
        assert (d.train_mask.sum(0) == 30).all()
        assert (d.val_mask.sum(0) == 20).all()
        assert (d.test_mask.sum(0) == 25).all()

    def test_seed_within_train(self):
        d = TestDataClasses().make_signed(seed=3)
        node_class_split(d, train_size_per_class=0.5, seed_size=0.3,
                         data_split=2)
        assert (d.seed_mask & ~d.train_mask).sum() == 0


class TestLinkSplit:
    def make_directed(self, seed=0):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        A, labels = DSBM(80, 3, 0.5, F, rng=np.random.default_rng(seed))
        return DirectedData(A=A, y=labels)

    @pytest.mark.parametrize("task", ["existence", "direction",
                                      "three_class_digraph"])
    def test_directed_tasks_label_consistency(self, task):
        d = self.make_directed()
        A = d.A.tocsr()
        datasets = link_class_split(d, splits=2, task=task, seed=1)
        for ind in datasets:
            for split in ("train", "val", "test"):
                edges = datasets[ind][split]["edges"]
                labels = datasets[ind][split]["label"]
                w_ij = np.asarray(A[edges[:, 0], edges[:, 1]]).ravel()
                w_ji = np.asarray(A[edges[:, 1], edges[:, 0]]).ravel()
                if task == "existence":
                    assert (np.abs(w_ij[labels == 0]) > 0).all()
                    assert (np.abs(w_ij[labels == 1]) == 0).all()
                elif task == "direction":
                    assert (np.abs(w_ij[labels == 0]) > 0).all()
                    assert (np.abs(w_ji[labels == 1]) > 0).all()
                else:
                    assert (np.abs(w_ij[labels == 0]) > 0).all()
                    assert (np.abs(w_ji[labels == 1]) > 0).all()
                    assert (np.abs(w_ij[labels == 2])
                            + np.abs(w_ji[labels == 2]) == 0).all()

    def test_observed_graph_weights_match(self):
        d = self.make_directed(seed=7)
        A = d.A.tocsr()
        datasets = link_class_split(d, splits=1, task="direction", seed=2)
        g = datasets[0]["graph"]
        w = datasets[0]["weights"]
        np.testing.assert_allclose(
            np.asarray(A[g[0], g[1]]).ravel(), w, rtol=1e-5)

    def test_connectivity_maintained(self):
        d = self.make_directed(seed=9)
        datasets = link_class_split(d, splits=1, task="direction", seed=3,
                                    maintain_connect=True)
        g = datasets[0]["graph"]
        n = d.num_nodes
        A_obs = sp.coo_matrix((np.ones(g.shape[1]), (g[0], g[1])),
                              shape=(n, n))
        ncomp, _ = sp.csgraph.connected_components(A_obs, directed=False)
        A_full = d.A
        ncomp_full, _ = sp.csgraph.connected_components(
            sp.coo_matrix((np.abs(A_full.data),
                           (A_full.row, A_full.col)), shape=(n, n)),
            directed=False)
        assert ncomp == ncomp_full

    def test_sign_task(self):
        (A_p, A_n), labels = SSBM(100, 3, 0.2, 0.1,
                                  rng=np.random.default_rng(11))
        d = SignedData(A=(A_p, A_n), y=labels)
        A = d.A.tocsr()
        datasets = link_class_split(d, splits=2, task="sign", seed=4,
                                    maintain_connect=False)
        for ind in datasets:
            for split in ("train", "val", "test"):
                edges = datasets[ind][split]["edges"]
                labels_ = datasets[ind][split]["label"]
                w = np.asarray(A[edges[:, 0], edges[:, 1]]).ravel()
                assert (w[labels_ == 1] > 0).all()
                assert (w[labels_ == 0] < 0).all()
                assert set(np.unique(labels_)) <= {0, 1}

    @pytest.mark.parametrize("task", ["four_class_signed_digraph",
                                      "five_class_signed_digraph"])
    def test_signed_digraph_tasks(self, task):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        F[0, 1] = -abs(F[0, 1])
        A, labels = SDSBM(100, 3, 0.5, F, eta=0.1,
                          rng=np.random.default_rng(13))
        d = SignedData(A=A, y=labels)
        Acsr = d.A.tocsr()
        datasets = link_class_split(d, splits=1, task=task, seed=5,
                                    maintain_connect=False)
        n_class = 4 if task.startswith("four") else 5
        for split in ("train", "val", "test"):
            edges = datasets[0][split]["edges"]
            labels_ = datasets[0][split]["label"]
            assert labels_.max() < n_class
            w_ij = np.asarray(Acsr[edges[:, 0], edges[:, 1]]).ravel()
            w_ji = np.asarray(Acsr[edges[:, 1], edges[:, 0]]).ravel()
            assert (w_ij[labels_ == 0] > 0).all()
            assert (w_ij[labels_ == 1] < 0).all()
            assert (w_ji[labels_ == 2] > 0).all()
            assert (w_ji[labels_ == 3] < 0).all()
            if n_class == 5:
                assert (np.abs(w_ij[labels_ == 4])
                        + np.abs(w_ji[labels_ == 4]) == 0).all()


class TestLinkSplitRatio:
    def test_ratio_subsamples_training_edges(self):
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        A, labels = DSBM(100, 3, 0.5, F, rng=np.random.default_rng(17))
        d = DirectedData(A=A, y=labels)
        full = link_class_split(d, splits=1, task="direction", seed=0,
                                maintain_connect=False, ratio=1.0)
        half = link_class_split(d, splits=1, task="direction", seed=0,
                                maintain_connect=False, ratio=0.5)
        assert (half[0]["train"]["edges"].shape[0]
                < full[0]["train"]["edges"].shape[0])
        # val/test sizes governed by prob_val/prob_test, not ratio
        assert (half[0]["test"]["label"].shape[0]
                == full[0]["test"]["label"].shape[0])
