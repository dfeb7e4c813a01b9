"""Functional graph operators (host-side builders → frozen Propagators).

The TPU-native replacement for PyG's gcn_norm / add_self_loops / coalesce /
to_undirected utilities used throughout the reference.  Everything here runs
once at preprocessing time and returns static-shape Propagators or numpy
arrays; nothing re-dispatches per forward.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp

from .ops.coo import build_coo
from .ops.coalesce import coalesce_edges
from .ops.spmm import Propagator, propagator_from_coo


def _as_numpy_graph(edge_index, edge_weight, num_nodes):
    edge_index = np.asarray(edge_index)
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.size else 0
    if edge_weight is None:
        edge_weight = np.ones(edge_index.shape[1], dtype=np.float64)
    else:
        edge_weight = np.asarray(edge_weight, dtype=np.float64)
    return edge_index, edge_weight, int(num_nodes)


def coalesce(edge_index, edge_weight=None, num_nodes: Optional[int] = None):
    """Sort by (row, col) and sum duplicate edges."""
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    r, c, w = coalesce_edges(edge_index[0], edge_index[1], edge_weight,
                             num_cols=num_nodes)
    return np.stack([r, c]), w


def to_undirected(edge_index, edge_weight=None, num_nodes: Optional[int] = None):
    """Symmetrize the edge set (duplicate weights coalesced by sum)."""
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    row = np.concatenate([edge_index[0], edge_index[1]])
    col = np.concatenate([edge_index[1], edge_index[0]])
    w = np.concatenate([edge_weight, edge_weight])
    return coalesce(np.stack([row, col]), w, num_nodes)


def add_remaining_self_loops(edge_index, edge_weight, num_nodes, fill_value=1.0):
    has_loop = np.zeros(num_nodes, dtype=bool)
    loop_mask = edge_index[0] == edge_index[1]
    has_loop[edge_index[0][loop_mask]] = True
    missing = np.nonzero(~has_loop)[0]
    row = np.concatenate([edge_index[0], missing])
    col = np.concatenate([edge_index[1], missing])
    w = np.concatenate([edge_weight, np.full(len(missing), fill_value)])
    return np.stack([row, col]), w


def gcn_norm(edge_index, edge_weight=None, num_nodes: Optional[int] = None,
             improved: bool = False, add_self_loops: bool = True):
    """PyG-style GCN normalization: D^-1/2 (A + fI) D^-1/2, f = 1 or 2."""
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    fill = 2.0 if improved else 1.0
    if add_self_loops:
        edge_index, edge_weight = add_remaining_self_loops(
            edge_index, edge_weight, num_nodes, fill)
    deg = np.zeros(num_nodes)
    deg = deg + np.bincount(edge_index[1], weights=edge_weight,
                            minlength=len(deg))  # in-degree at target
    dinv = np.zeros_like(deg)
    nz = deg > 0
    dinv[nz] = deg[nz] ** -0.5
    norm = dinv[edge_index[0]] * edge_weight * dinv[edge_index[1]]
    return edge_index, norm


def gcn_norm_propagator(edge_index, edge_weight=None,
                        num_nodes: Optional[int] = None,
                        improved: bool = False, add_self_loops: bool = True,
                        mode: str = "auto") -> Propagator:
    """GCN-normalized operator aggregating at the TARGET node
    (PyG default flow source_to_target): out[t] += norm * x[s].

    Used by DGCNConv (reference nn/directed/DGCNConv.py:75) and the DiGCL
    encoder's GCNConv.
    """
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    ei, norm = gcn_norm(edge_index, edge_weight, num_nodes, improved,
                        add_self_loops)
    A = build_coo(ei[1], ei[0], norm, num_nodes, sum_duplicates=True)
    return propagator_from_coo(A, mode=mode)


def norm_propagator(edge_index, edge_weight, num_nodes: Optional[int] = None,
                    flow: str = "source_to_target",
                    mode: str = "auto") -> Propagator:
    """Wrap a precomputed normalized adjacency (e.g. DiGCN appr adj) as a
    Propagator.  flow follows PyG: 'source_to_target' aggregates at
    edge_index[1] (DiGCNConv), 'target_to_source' at edge_index[0]."""
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    if flow == "source_to_target":
        row, col = edge_index[1], edge_index[0]
    else:
        row, col = edge_index[0], edge_index[1]
    A = build_coo(row, col, edge_weight, num_nodes, sum_duplicates=True)
    return propagator_from_coo(A, mode=mode)


def rw_norm_propagator(edge_index, edge_weight=None,
                       num_nodes: Optional[int] = None,
                       fill_value: float = 0.5, add_self_loops: bool = True,
                       mode: str = "auto") -> Propagator:
    """Row-normalized D^-1 (A + fI) aggregating at the SOURCE node
    (flow target_to_source) — the reference's conv_norm_rw + Conv_Base
    (nn/general/conv_base.py:12-117), used by DIMPA and SIMPA.
    """
    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    if add_self_loops:
        edge_index, edge_weight = add_remaining_self_loops(
            edge_index, edge_weight, num_nodes, fill_value)
    deg = np.zeros(num_nodes)
    deg = deg + np.bincount(edge_index[0], weights=edge_weight,
                            minlength=len(deg))
    dinv = np.zeros_like(deg)
    nz = deg > 0
    dinv[nz] = 1.0 / deg[nz]
    norm = dinv[edge_index[0]] * edge_weight
    A = build_coo(edge_index[0], edge_index[1], norm, num_nodes,
                  sum_duplicates=True)
    return propagator_from_coo(A, mode=mode)


def rw_norm_dual_propagator(edge_index, edge_weight=None,
                            num_nodes: Optional[int] = None,
                            fill_value: float = 0.5,
                            mode: str = "mxu"):
    """Fuse DIMPA's two walk operators — P_s = rw_norm(A) and
    P_t = rw_norm(A^T) — into ONE operator over the union of both edge
    directions (val_a carries the forward normalization, 0 on reverse
    entries; val_b symmetric), so [P_s x_s | P_t x_t] runs as one
    gather + scatter per hop (ops.spmm.dual_spmm_stacked) — the same
    union-edge-set trick as nn.signed.sgcn.sgcn_dual_propagator, taken
    over direction instead of sign.  Returns None where fusion buys
    nothing (dense tier)."""
    from .ops.spmm import dual_propagator

    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)

    def side(ei, w):
        ei2, w2 = add_remaining_self_loops(ei, w, num_nodes, fill_value)
        deg = np.bincount(ei2[0], weights=w2, minlength=num_nodes)
        dinv = np.zeros_like(deg)
        nz = deg > 0
        dinv[nz] = 1.0 / deg[nz]
        return ei2, dinv[ei2[0]] * w2

    ei_s, norm_s = side(edge_index, edge_weight)
    ei_t, norm_t = side(edge_index[[1, 0]], edge_weight)
    row = np.concatenate([ei_s[0], ei_t[0]])
    col = np.concatenate([ei_s[1], ei_t[1]])
    va = np.concatenate([norm_s, np.zeros(len(norm_t))])
    vb = np.concatenate([np.zeros(len(norm_s)), norm_t])
    return dual_propagator(row, col, va, vb, num_nodes=num_nodes,
                           mode=mode)


def adj_dual_propagator(edge_index, edge_weight=None,
                        num_nodes: Optional[int] = None,
                        mode: str = "mxu"):
    """A and A^T fused as ONE union-edge-set operator: a pass computes
    [A X_a | A^T X_b] with one gather + scatter (the adjacency-volume
    counterpart of rw_norm_dual_propagator — same trick, unnormalized
    weights).  Accepted by Prob_Imbalance_Loss in place of the
    (P_A, P_AT) pair; halves the imbalance loss's propagator passes
    (A·P and A^T·P) at giant scale.  Duplicate edges sum, matching the
    coalesced single-propagator pair."""
    from .ops.spmm import dual_propagator

    edge_index, edge_weight, num_nodes = _as_numpy_graph(
        edge_index, edge_weight, num_nodes)
    e = len(edge_weight)
    row = np.concatenate([edge_index[0], edge_index[1]])
    col = np.concatenate([edge_index[1], edge_index[0]])
    va = np.concatenate([edge_weight, np.zeros(e)])
    vb = np.concatenate([np.zeros(e), edge_weight])
    return dual_propagator(row, col, va, vb, num_nodes=num_nodes,
                           mode=mode)


def mean_propagator(edge_index, num_nodes: Optional[int] = None,
                    flow: str = "source_to_target",
                    mode: str = "auto") -> Propagator:
    """Unweighted mean aggregation: out[t] = mean_{(s,t) in E} x[s].

    Matches PyG MessagePassing(aggr='mean') used by SGCNConv
    (reference nn/signed/SGCNConv.py:73); nodes without in-edges get 0.
    """
    edge_index, _, num_nodes = _as_numpy_graph(edge_index, None, num_nodes)
    if flow == "source_to_target":
        row, col = edge_index[1], edge_index[0]
    else:
        row, col = edge_index[0], edge_index[1]
    cnt = np.zeros(num_nodes)
    cnt = cnt + np.bincount(row, minlength=len(cnt)).astype(cnt.dtype)
    cnt[cnt == 0] = 1.0
    val = 1.0 / cnt[row]
    A = build_coo(row, col, val, num_nodes, sum_duplicates=False)
    return propagator_from_coo(A, mode=mode)


def directed_features_in_out(edge_index, size: int, edge_weight=None):
    """DGCN 2nd-order in/out proximity graphs.

    Reference utils/directed/features_in_out.py:9-59 builds
    A_in = sum_k outer(a[k,:], a[k,:]) / colsum_k and
    A_out = sum_k outer(a[:,k], a[:,k]) / rowsum_k with an O(N) Python loop
    of sparse outer products; here both collapse to two sparse matmuls
    A^T D_c^-1 A and A D_r^-1 A^T (identical values, vectorized).

    Returns (index_undirected, edge_in, in_weight, edge_out, out_weight).
    """
    edge_index, edge_weight, size = _as_numpy_graph(edge_index, edge_weight, size)
    a = sp.coo_matrix((edge_weight, (edge_index[0], edge_index[1])),
                      shape=(size, size)).tocsr()
    out_degree = np.asarray(a.sum(axis=0)).ravel()
    out_degree[out_degree == 0] = 1
    in_degree = np.asarray(a.sum(axis=1)).ravel()
    in_degree[in_degree == 0] = 1

    A_in = (a.T @ sp.diags(1.0 / out_degree) @ a).tocoo()
    A_out = (a @ sp.diags(1.0 / in_degree) @ a.T).tocoo()

    edge_in = np.vstack([A_in.row, A_in.col]).astype(np.int64)
    edge_out = np.vstack([A_out.row, A_out.col]).astype(np.int64)
    index_undirected, _ = to_undirected(edge_index, None, size)
    return (index_undirected, edge_in, A_in.data.astype(np.float32),
            edge_out, A_out.data.astype(np.float32))


def in_out_degree(edge_index, size: Optional[int] = None, signed: bool = False,
                  edge_weight=None) -> np.ndarray:
    """(in, out) degree features; signed graphs get 4 columns (in±, out±).

    Reference utils/general/in_out_degree.py:9-52.
    """
    edge_index, edge_weight, size = _as_numpy_graph(edge_index, edge_weight, size)
    if signed:
        A = sp.coo_matrix((edge_weight, (edge_index[0], edge_index[1])),
                          shape=(size, size)).tocsr()
        A_abs = A.copy()
        A_abs.data = np.abs(A_abs.data)
        A_p = (A_abs + A) / 2
        A_n = (A_abs - A) / 2
        out_pos = np.asarray(A_p.sum(axis=0)).ravel()
        out_neg = np.asarray(A_n.sum(axis=0)).ravel()
        in_pos = np.asarray(A_p.sum(axis=1)).ravel()
        in_neg = np.asarray(A_n.sum(axis=1)).ravel()
        return np.stack([in_pos, in_neg, out_pos, out_neg], axis=1).astype(np.float32)
    # Orientation matches the reference (:50-52): "in" is the row sum of
    # A[edge_index[0], edge_index[1]], "out" the column sum.
    w = np.abs(edge_weight)
    in_deg = np.zeros(size)
    out_deg = np.zeros(size)
    in_deg = in_deg + np.bincount(edge_index[0], weights=w,
                                  minlength=len(in_deg))
    out_deg = out_deg + np.bincount(edge_index[1], weights=w,
                                    minlength=len(out_deg))
    return np.stack([in_deg, out_deg], axis=1).astype(np.float32)
