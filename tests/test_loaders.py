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


class TestGeomGCNLoaders:
    def test_webkb_from_local_files(self, tmp_path):
        # synthesize the geom-gcn raw format locally
        d = tmp_path / "texas"
        d.mkdir()
        (d / "out1_node_feature_label.txt").write_text(
            "node feat label\n"
            "0\t1,0,1\t0\n1\t0,1,0\t1\n2\t1,1,0\t0\n3\t0,0,1\t1\n")
        (d / "out1_graph_edges.txt").write_text(
            "src dst\n0\t1\n1\t2\n2\t3\n0\t1\n")
        from pytorch_geometric_signed_directed_tpu.data.load_real import WebKB

        data = WebKB("texas", root=str(tmp_path))
        assert data.x.shape == (4, 3)
        assert data.y.tolist() == [0, 1, 0, 1]
        assert data.edge_index.shape == (2, 3)  # duplicate coalesced
        assert data.train_mask.shape[0] == 4

    def test_wikics_from_local_json(self, tmp_path):
        import json

        d = tmp_path / "wikics"
        d.mkdir()
        payload = {
            "features": [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]],
            "labels": [0, 1, 0],
            "links": [[1], [2], [0]],
            "train_masks": [[True, False, False]] * 2,
            "val_masks": [[False, True, False]] * 2,
            "test_mask": [False, False, True],
            "stopping_masks": [[False, False, True]] * 2,
        }
        (d / "data.json").write_text(json.dumps(payload))
        from pytorch_geometric_signed_directed_tpu.data.load_real import WikiCS

        data = WikiCS(root=str(tmp_path))
        assert data.x.shape == (3, 2)
        assert data.edge_index.shape == (2, 3)
        assert data.train_mask.shape == (3, 2)


@needs_bundle
def test_transform_hooks():
    calls = []

    def transform(data):
        calls.append("t")
        data.extra_attr = 42
        return data

    d = load_directed_real_data("telegram", transform=transform)
    assert calls == ["t"]
    assert d.extra_attr == 42


class TestProcessedCache:
    def test_csv_loader_caches_and_short_circuits(self, tmp_path,
                                                  monkeypatch):
        """Second construction must come from the processed npz (raw file
        deleted between loads), matching the first load exactly."""
        monkeypatch.setenv("PGSD_TPU_DATA", str(tmp_path))
        raw = tmp_path / "bitcoin_alpha.csv"
        rng = np.random.default_rng(0)
        lines = [f"u{a},u{b},{w:.1f}"
                 for a, b, w in zip(rng.integers(0, 30, 200),
                                    rng.integers(0, 30, 200),
                                    rng.choice([-1.0, 1.0, 3.0], 200))]
        raw.write_text("\n".join(lines) + "\n")

        d1 = load_signed_real_data("bitcoin_alpha", root=str(tmp_path))
        assert (tmp_path / "processed" / "sdgnn_bitcoin_alpha.npz").exists()
        raw.unlink()
        d2 = load_signed_real_data("bitcoin_alpha", root=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(d1.edge_index),
                                      np.asarray(d2.edge_index))
        np.testing.assert_array_equal(np.asarray(d1.edge_weight),
                                      np.asarray(d2.edge_weight))

    def test_cache_preserves_masks_and_features(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PGSD_TPU_DATA", str(tmp_path))
        import scipy.sparse as sp
        rng = np.random.default_rng(1)
        n = 60
        A = sp.random(n, n, density=0.2, random_state=2, format="csr")
        tdir = tmp_path / "telegram"
        tdir.mkdir()
        sp.save_npz(tdir / "telegram_adj.npz", A.tocoo())
        np.save(tdir / "telegram_labels.npy", rng.integers(0, 4, n))

        from pytorch_geometric_signed_directed_tpu.data.load_real import (
            Telegram)

        d1 = Telegram(root=str(tmp_path))
        d2 = Telegram(root=str(tmp_path))
        np.testing.assert_array_equal(np.asarray(d1.train_mask),
                                      np.asarray(d2.train_mask))
        np.testing.assert_array_equal(np.asarray(d1.x), np.asarray(d2.x))
        np.testing.assert_array_equal(np.asarray(d1.y), np.asarray(d2.y))

    def test_no_cache_env_disables(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PGSD_TPU_DATA", str(tmp_path))
        monkeypatch.setenv("PGSD_TPU_NO_CACHE", "1")
        raw = tmp_path / "bitcoin_otc.csv"
        raw.write_text("a,b,1.0\nb,c,-2.0\n")
        load_signed_real_data("bitcoin_otc", root=str(tmp_path))
        assert not (tmp_path / "processed").exists()


class TestBlockedDatasetFormats:
    """cora_ml / slashdot / epinions raw files are not bundled in this
    environment (zero egress).  These tests construct synthetic fixtures
    in their EXACT on-disk formats (reference data/directed/citation.py
    npz schema; data/signed/SDGNN_real_data.py:9-15 CSV schema) so the
    moment the real files land under $PGSD_TPU_DATA the accuracy configs
    run unchanged."""

    def _citation_npz(self, path, n=40, f=12, c=5, seed=0):
        import scipy.sparse as sp
        rng = np.random.default_rng(seed)
        adj = sp.random(n, n, density=0.05, random_state=1,
                        format="csr", dtype=np.float32)
        attr = sp.random(n, f, density=0.3, random_state=2,
                         format="csr", dtype=np.float32)
        np.savez(path,
                 adj_data=adj.data, adj_indices=adj.indices,
                 adj_indptr=adj.indptr, adj_shape=np.array(adj.shape),
                 attr_data=attr.data, attr_indices=attr.indices,
                 attr_indptr=attr.indptr, attr_shape=np.array(attr.shape),
                 labels=rng.integers(0, c, n))
        return adj

    def test_cora_ml_npz_schema(self, tmp_path, monkeypatch):
        monkeypatch.setenv("PGSD_TPU_DATA", str(tmp_path))
        # big enough for the baked-in 20/class + val-500 split
        adj = self._citation_npz(tmp_path / "cora_ml.npz", n=700, c=7)
        d = load_directed_real_data("cora_ml", root=str(tmp_path))
        assert d.num_nodes == 700
        assert d.x.shape == (700, 12)
        assert d.train_mask.shape == (700, 10)
        assert (d.train_mask.sum(0) == 7 * 20).all()
        assert (d.val_mask.sum(0) == 500).all()
        coo = adj.tocoo()
        got = set(zip(np.asarray(d.edge_index[0]).tolist(),
                      np.asarray(d.edge_index[1]).tolist()))
        assert got == set(zip(coo.row.tolist(), coo.col.tolist()))

    @pytest.mark.parametrize("name", ["slashdot", "epinions"])
    def test_sdgnn_csv_schema(self, name, tmp_path, monkeypatch):
        monkeypatch.setenv("PGSD_TPU_DATA", str(tmp_path))
        rng = np.random.default_rng(3)
        rows = rng.integers(0, 50, 400)
        cols = rng.integers(0, 50, 400)
        signs = rng.choice([-1, 1], 400)
        lines = [f"n{a},n{b},{s}" for a, b, s in zip(rows, cols, signs)]
        (tmp_path / f"{name}.csv").write_text("\n".join(lines) + "\n")
        d = load_signed_real_data(name, root=str(tmp_path))
        assert d.is_signed
        assert d.edge_index.shape[1] == 400
        d.separate_positive_negative()
        assert d.A_p.nnz > 0 and d.A_n.nnz > 0
