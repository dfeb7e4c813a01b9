"""Motif adjacency parity: vectorized sparse-matmul construction vs a
direct set-intersection implementation of the same definitions
(reference SiGAT.py:94-185, SDGNN.py:154-255)."""
from collections import defaultdict

import numpy as np

from pytorch_geometric_signed_directed_tpu.nn.signed.motifs import (
    _SDGNN_MASK_NEG,
    _SDGNN_MASK_POS,
    sdgnn_edge_lists,
    sigat_edge_lists,
)


def naive_adj_lists(edge_index_s, n):
    """Direct translation of the motif definitions with Python sets."""
    pos_out, pos_in = defaultdict(set), defaultdict(set)
    neg_out, neg_in = defaultdict(set), defaultdict(set)
    pos_und, neg_und = defaultdict(set), defaultdict(set)
    for i, j, s in np.asarray(edge_index_s).tolist():
        if s > 0:
            pos_und[i].add(j)
            pos_und[j].add(i)
            pos_out[i].add(j)
            pos_in[j].add(i)
        if s < 0:
            neg_und[i].add(j)
            neg_und[j].add(i)
            neg_out[i].add(j)
            neg_in[j].add(i)

    def tri_counts(u, v):
        return [
            len(pos_out[u] & pos_in[v]), len(pos_out[u] & neg_in[v]),
            len(neg_out[u] & pos_in[v]), len(neg_out[u] & neg_in[v]),
            len(pos_out[u] & pos_out[v]), len(pos_out[u] & neg_out[v]),
            len(neg_out[u] & pos_out[v]), len(neg_out[u] & neg_out[v]),
            len(pos_in[u] & pos_out[v]), len(pos_in[u] & neg_out[v]),
            len(neg_in[u] & pos_out[v]), len(neg_in[u] & neg_out[v]),
            len(pos_in[u] & pos_in[v]), len(pos_in[u] & neg_in[v]),
            len(neg_in[u] & pos_in[v]), len(neg_in[u] & neg_in[v]),
        ]

    adds1 = [set() for _ in range(16)]
    adds2 = [set() for _ in range(16)]
    for i in list(pos_out):
        for j in pos_out[i]:
            for idx, v in enumerate(tri_counts(i, j)):
                if v > 0:
                    adds1[idx].add((i, j))
    for i in list(neg_out):
        for j in neg_out[i]:
            for idx, v in enumerate(tri_counts(i, j)):
                if v > 0:
                    adds2[idx].add((i, j))
    base = [
        {(a, b) for a in pos_und for b in pos_und[a]},
        {(a, b) for a in pos_out for b in pos_out[a]},
        {(a, b) for a in pos_in for b in pos_in[a]},
        {(a, b) for a in neg_und for b in neg_und[a]},
        {(a, b) for a in neg_out for b in neg_out[a]},
        {(a, b) for a in neg_in for b in neg_in[a]},
    ]
    return base + adds1 + adds2, tri_counts


def random_signed_edges(n=40, e=250, seed=0):
    rng = np.random.default_rng(seed)
    row = rng.integers(0, n, e)
    col = rng.integers(0, n, e)
    keep = row != col
    row, col = row[keep], col[keep]
    sign = rng.choice([-1, 1], len(row))
    return np.stack([row, col, sign], axis=1)


def test_sigat_motifs_match_naive():
    n = 40
    eis = random_signed_edges(n)
    ours = sigat_edge_lists(eis, n)
    naive, _ = naive_adj_lists(eis, n)
    assert len(ours) == len(naive) == 38
    for k, (o, ref) in enumerate(zip(ours, naive)):
        got = set(map(tuple, np.asarray(o).T.tolist()))
        assert got == ref, f"motif {k}: {len(got)} vs {len(ref)}"


def test_sdgnn_weights_match_naive():
    n = 40
    eis = random_signed_edges(n, seed=3)
    edge_lists, tri_weight = sdgnn_edge_lists(eis, n)
    naive, tri_counts = naive_adj_lists(eis, n)
    # edge lists: pos_out, pos_in, neg_out, neg_in = naive base [1,2,4,5]
    for o, ref_idx in zip(edge_lists, (1, 2, 4, 5)):
        got = set(map(tuple, np.asarray(o).T.tolist()))
        assert got == naive[ref_idx]
    # triangle weights (where only one sign covers the pair)
    e = np.asarray(eis)
    pos_pairs = {(i, j) for i, j, s in e.tolist() if s > 0}
    neg_pairs = {(i, j) for i, j, s in e.tolist() if s < 0}
    for (i, j) in list(pos_pairs - neg_pairs)[:50]:
        expect = int(np.dot(tri_counts(i, j), _SDGNN_MASK_POS))
        assert tri_weight[i, j] == expect, (i, j)
    for (i, j) in list(neg_pairs - pos_pairs)[:50]:
        expect = int(np.dot(tri_counts(i, j), _SDGNN_MASK_NEG))
        assert tri_weight[i, j] == expect, (i, j)
