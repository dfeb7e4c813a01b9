"""General (signed + directed) family: MSConv/MSGNN.

Mirrors reference test/general_test.py: SDSBM mock data, 4- and 5-class
signed-digraph link splits, signed magnetic Laplacian flag combos.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pytorch_geometric_signed_directed_tpu.data import SDSBM, SignedData
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import (
    MSGNN_link_prediction,
    MSGNN_node_classification,
)
from pytorch_geometric_signed_directed_tpu.spectral import (
    magnet_propagators,
    magnetic_template,
)
from pytorch_geometric_signed_directed_tpu.utils import (
    link_class_split,
    meta_graph_generation,
)

K_CLUSTERS = 3


def create_mock_data(n=60, seed=0):
    F = meta_graph_generation("cyclic", K_CLUSTERS, 0.05, False)
    F[0, 1] = -abs(F[0, 1])
    A, labels = SDSBM(n, K_CLUSTERS, 0.5, F, eta=0.1,
                      rng=np.random.default_rng(seed))
    return SignedData(A=A, y=labels)


class TestMSGNN:
    def test_node_classification(self):
        d = create_mock_data()
        n = d.num_nodes
        x = in_out_degree(d.edge_index, n, signed=True,
                          edge_weight=d.edge_weight)
        for absolute_degree in (True, False):
            lap = magnet_propagators(d.edge_index, d.edge_weight, q=0.25,
                                     num_nodes=n, signed=True,
                                     absolute_degree=absolute_degree)
            model = MSGNN_node_classification(
                num_features=4, hidden=8, K=2, label_dim=K_CLUSTERS,
                absolute_degree=absolute_degree)
            params = model.init(jax.random.PRNGKey(0), x, x, lap)
            z, logp, pred, prob = model.apply(params, x, x, lap)
            assert logp.shape == (n, K_CLUSTERS)
            assert z.shape == (n, 16)
            np.testing.assert_allclose(np.asarray(prob.sum(1)), 1, rtol=1e-4)

    @pytest.mark.parametrize("task,label_dim", [
        ("four_class_signed_digraph", 4),
        ("five_class_signed_digraph", 5),
    ])
    def test_link_prediction_splits(self, task, label_dim):
        d = create_mock_data(seed=1)
        n = d.num_nodes
        datasets = link_class_split(d, splits=1, task=task, seed=0,
                                    maintain_connect=False)
        g = datasets[0]["graph"]
        w = datasets[0]["weights"]
        x = in_out_degree(g, n, signed=True, edge_weight=w)
        lap = magnet_propagators(g, w, q=0.2, num_nodes=n, signed=True)
        q_edges = jnp.asarray(datasets[0]["train"]["edges"])
        model = MSGNN_link_prediction(num_features=4, hidden=8, K=1,
                                      label_dim=label_dim)
        params = model.init(jax.random.PRNGKey(0), x, x, lap, q_edges)
        out, emb = model.apply(params, x, x, lap, q_edges)
        assert out.shape == (q_edges.shape[0], label_dim)
        assert emb.shape == (q_edges.shape[0], 4 * 8)

    def test_trainable_q_signed(self):
        d = create_mock_data(seed=2)
        n = d.num_nodes
        x = in_out_degree(d.edge_index, n, signed=True,
                          edge_weight=d.edge_weight)
        tmpl = magnetic_template(d.edge_index, d.edge_weight, n, signed=True)
        model = MSGNN_node_classification(num_features=4, hidden=4, K=1,
                                          label_dim=K_CLUSTERS,
                                          trainable_q=True)
        params = model.init(jax.random.PRNGKey(0), x, x, tmpl)
        _, logp, _, _ = model.apply(params, x, x, tmpl)
        assert np.isfinite(np.asarray(logp)).all()
