"""Every example script runs end-to-end (tiny settings, CPU mesh).

The examples are the de-facto trainer layer (reference keeps its training
loops in examples/ too, SURVEY.md §1) — they must stay runnable.
"""
import os
import runpy
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")
BUNDLE_OK = os.path.isdir("/root/reference/datasets")


def run_example(name, argv):
    old = sys.argv
    sys.argv = [name] + argv
    try:
        runpy.run_path(os.path.join(EXAMPLES, name), run_name="__main__")
    finally:
        sys.argv = old


def test_magnet_link_synthetic(capsys):
    run_example("magnet_link.py",
                ["--dataset", "synthetic", "--num_nodes", "80",
                 "--epochs", "5", "--splits", "1"])
    assert "mean test acc" in capsys.readouterr().out


def test_magnet_node_synthetic(capsys):
    run_example("magnet_node.py",
                ["--dataset", "synthetic", "--num_nodes", "80",
                 "--epochs", "5"])
    assert "mean test acc" in capsys.readouterr().out


def test_digrac(capsys):
    run_example("digrac.py", ["--N", "80", "--epochs", "5"])
    assert "ARI" in capsys.readouterr().out


@pytest.mark.slow
def test_sssnet(capsys):
    run_example("sssnet.py", ["--N", "100", "--epochs", "5"])
    assert "mean ARI" in capsys.readouterr().out


def test_msgnn_link_synthetic(capsys):
    run_example("msgnn_link.py",
                ["--dataset", "synthetic", "--num_nodes", "100",
                 "--epochs", "5"])
    assert "test acc" in capsys.readouterr().out


@pytest.mark.skipif(not BUNDLE_OK, reason="dataset bundle not available")
@pytest.mark.slow
def test_digcn_inception_telegram(capsys):
    run_example("digcn_inception_node.py", ["--epochs", "3"])
    assert "mean test acc" in capsys.readouterr().out


@pytest.mark.skipif(not BUNDLE_OK, reason="dataset bundle not available")
@pytest.mark.slow
def test_digcl_telegram(capsys):
    run_example("digcl_node.py", ["--epochs", "3", "--dataset", "telegram",
                                  "--splits", "1"])
    assert "test acc" in capsys.readouterr().out


@pytest.mark.skipif(not BUNDLE_OK, reason="dataset bundle not available")
@pytest.mark.slow
def test_link_sign_prediction_sgcn(capsys):
    run_example("run_link_sign_prediction.py",
                ["--dataset", "bitcoin_alpha", "--epochs", "3",
                 "--emb_dim", "8"])
    assert "auc" in capsys.readouterr().out


@pytest.mark.parametrize("method", ["sgcn", "snea", "msgnn", "sssnet"])
def test_link_sign_direction_tasks(capsys, method):
    """--method dispatch over four_class_signed_digraph (reference
    examples/run_link_sign_direction_tasks.py:200-210)."""
    run_example("run_link_sign_direction_tasks.py",
                ["--dataset", "synthetic", "--num_nodes", "90",
                 "--runs", "1", "--epochs", "2", "--method", method,
                 "--in_dim", "8", "--out_dim", "8", "--hidden", "8"])
    assert "mean acc" in capsys.readouterr().out


@pytest.mark.parametrize("method", ["sigat", "sdgnn"])
@pytest.mark.slow
def test_link_sign_direction_tasks_attention(capsys, method):
    run_example("run_link_sign_direction_tasks.py",
                ["--dataset", "synthetic", "--num_nodes", "70",
                 "--runs", "1", "--epochs", "2", "--method", method,
                 "--in_dim", "8", "--out_dim", "8", "--num_classes", "5",
                 "--direction_only"])
    assert "direction_only mean acc" in capsys.readouterr().out


def test_dgcn_link_synthetic(capsys):
    run_example("dgcn_link.py",
                ["--dataset", "synthetic", "--num_nodes", "80",
                 "--epochs", "3", "--splits", "1"])
    assert "mean test acc" in capsys.readouterr().out


def test_digcn_link_synthetic(capsys):
    run_example("digcn_link.py",
                ["--dataset", "synthetic", "--num_nodes", "80",
                 "--epochs", "3", "--splits", "1"])
    assert "mean test acc" in capsys.readouterr().out


def test_digcn_inception_link_synthetic(capsys):
    run_example("digcn_inception_link.py",
                ["--dataset", "synthetic", "--num_nodes", "80",
                 "--epochs", "3", "--splits", "1"])
    assert "mean test acc" in capsys.readouterr().out


def test_msgnn_node_synthetic(capsys):
    run_example("msgnn_node.py",
                ["--dataset", "synthetic", "--num_nodes", "150",
                 "--epochs", "3"])
    assert "mean test acc" in capsys.readouterr().out


@pytest.mark.skipif(not BUNDLE_OK, reason="dataset bundle not available")
def test_dgcn_node_telegram(capsys):
    run_example("dgcn_node.py", ["--epochs", "3"])
    assert "mean test acc" in capsys.readouterr().out


@pytest.mark.skipif(not BUNDLE_OK, reason="dataset bundle not available")
@pytest.mark.slow
def test_digcl_link_telegram(capsys):
    run_example("digcl_link.py", ["--epochs", "3", "--dataset", "telegram",
                                  "--splits", "1"])
    assert "test acc" in capsys.readouterr().out
