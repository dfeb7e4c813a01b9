"""Smoke: the bench harness functions run end-to-end at tiny scale.

The driver runs bench.py on the real chip every round; these smokes
catch bench-function rot (signature drift, path changes) in the CPU
suite without waiting for a TPU run.  Tiny shapes, 2 steps.
"""
import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import bench  # noqa: E402


@pytest.mark.slow
def test_bench_snea_smoke(capsys):
    bench.bench_snea(n=200, e_pos=600, e_neg=150, steps=2)
    out = capsys.readouterr().out
    assert '"snea_attention_train_edges_per_s_per_chip"' in out


@pytest.mark.slow
def test_bench_sgcn_smoke(capsys):
    bench.bench_sgcn(n=256, e_pos=700, e_neg=200, steps=2)
    out = capsys.readouterr().out
    assert '"sgcn_train_edges_per_s_per_chip"' in out


@pytest.mark.slow
def test_bench_sigat_smoke(capsys):
    bench.bench_sigat(n=120, e_pos=400, e_neg=80, steps=2)
    out = capsys.readouterr().out
    assert '"sigat_train_edges_per_s_per_chip"' in out


@pytest.mark.slow
def test_bench_digcl_smoke(capsys):
    bench.bench_digcl(n=512, avg_deg=6, steps=2, batch_size=128,
                      base_batch=64)
    out = capsys.readouterr().out
    assert '"digcl_contrastive_train_pairs_per_s_per_chip"' in out
