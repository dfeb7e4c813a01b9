"""Real-data loaders against the locally bundled dataset files."""
import os

import numpy as np
import pytest

from pytorch_geometric_signed_directed_tpu.data import (
    load_directed_real_data,
    load_signed_real_data,
)

BUNDLE = "/root/reference/datasets"
needs_bundle = pytest.mark.skipif(not os.path.isdir(BUNDLE),
                                  reason="dataset bundle not available")


@needs_bundle
class TestSignedLoaders:
    def test_bitcoin_alpha(self):
        d = load_signed_real_data("bitcoin_alpha")
        assert d.num_nodes == 3783
        assert d.is_signed
        d.separate_positive_negative()
        assert d.A_p.nnz > 20000 and d.A_n.nnz > 1000

    def test_bitcoin_otc(self):
        d = load_signed_real_data("bitcoin_otc")
        assert d.num_nodes == 5881
        assert d.is_signed

    def test_sampson_has_features(self):
        d = load_signed_real_data("sampson")
        assert d.x is not None and d.x.shape[1] == 1
        assert d.y is not None

    def test_fill(self):
        d = load_signed_real_data("FiLL-OPCL2000", sparsify_level=0.2)
        assert d.is_signed
        assert d.num_nodes > 100

    def test_node_split_passthrough(self):
        d = load_signed_real_data("sampson", train_size=10, val_size=5,
                                  data_split=2)
        assert d.train_mask.shape[1] == 2
        assert (d.train_mask.sum(0) == 10).all()


@needs_bundle
class TestDirectedLoaders:
    def test_telegram(self):
        d = load_directed_real_data("telegram")
        assert d.num_nodes == 245
        assert d.y is not None and d.x is not None
        # baked-in 60/20/20 split
        assert d.train_mask.shape == (245, 10)

    def test_blog(self):
        d = load_directed_real_data("blog")
        assert d.num_nodes > 1000

    def test_citeseer(self):
        d = load_directed_real_data("citeseer")
        assert d.x is not None
        assert d.train_mask is not None

    def test_lead_lag(self):
        d = load_directed_real_data("lead_lag2015")
        assert d.num_nodes > 100

    def test_bad_name_raises(self):
        with pytest.raises(NameError):
            load_directed_real_data("nonexistent_dataset")
