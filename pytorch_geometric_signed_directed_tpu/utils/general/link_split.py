"""Link-level splitting: the 6-task contract of the reference.

Reference: utils/general/link_split.py (undirected_label2directed_label
:13-164, link_class_split :167-422).  Tasks: existence / direction /
three_class_digraph / sign / four_class_signed_digraph /
five_class_signed_digraph, with optional connectivity preservation via a
spanning forest kept in train.  Pure numpy/scipy; returns numpy arrays
(the jitted training step consumes them as static-shape device arrays).
"""
from typing import List, Tuple, Union

import numpy as np
import scipy.sparse as sp

from ..signed.sampling import negative_sampling


def _pairs_to_keys(pairs: np.ndarray, n: int) -> np.ndarray:
    return pairs[:, 0].astype(np.int64) * n + pairs[:, 1].astype(np.int64)


def _keys_to_pairs(keys: np.ndarray, n: int) -> np.ndarray:
    return np.stack([keys // n, keys % n], axis=1).astype(np.int64)


def _lookup(A: sp.csr_matrix, pairs: np.ndarray) -> np.ndarray:
    if len(pairs) == 0:
        return np.zeros(0)
    return np.asarray(A[pairs[:, 0], pairs[:, 1]]).ravel()


def undirected_label2directed_label(
    A: sp.csr_matrix, edge_pairs, task: str, directed_graph: bool = True,
    signed_directed: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Label query pairs by their relation to the adjacency.

    Returns (new_edge_pairs, labels, label_weight, undirected_pairs); label
    semantics per task documented in the reference (:26-41) and in
    link_class_split below.
    """
    edge_pairs = np.asarray(list(map(list, edge_pairs)), dtype=np.int64)
    if len(edge_pairs) == 0:
        return (np.zeros((0, 2), np.int64), np.zeros(0, np.int32),
                np.zeros(0), np.zeros((0, 2), np.int64))
    n = A.shape[0]
    w_ij = _lookup(A, edge_pairs)
    w_ji = _lookup(A, edge_pairs[:, [1, 0]])

    if signed_directed:
        undirected_mask = (w_ij != 0) & (w_ji != 0)
        undirected = edge_pairs[undirected_mask]
        # unique keys per category, with both-direction pairs removed
        keys = _pairs_to_keys(edge_pairs, n)
        und_keys = set(keys[undirected_mask].tolist())

        def uniq(mask):
            k = np.unique(keys[mask])
            return k[~np.isin(k, list(und_keys))] if und_keys else k

        dp = _keys_to_pairs(uniq((w_ij > 0)), n)
        dn = _keys_to_pairs(uniq((w_ij < 0)), n)
        negative = _keys_to_pairs(
            np.unique(keys[(w_ij == 0) & (w_ji == 0)]), n)

        new_edge_pairs = np.vstack([dp, dn, dp[:, [1, 0]], dn[:, [1, 0]],
                                    negative])
        labels = np.concatenate([
            np.zeros(len(dp), np.int32), np.ones(len(dn), np.int32),
            np.full(len(dp), 2, np.int32), np.full(len(dn), 3, np.int32),
            np.full(len(negative), 4, np.int32)])
        w_direct = np.concatenate([_lookup(A, dp), _lookup(A, dn)])
        label_weight = np.concatenate([w_direct, w_direct,
                                       np.zeros(len(negative))])
        if len(dp):
            assert label_weight[labels == 0].min() > 0
        if len(dn):
            assert label_weight[labels == 1].max() < 0
    elif directed_graph:
        undirected_mask = (np.abs(w_ij) > 0) & (np.abs(w_ji) > 0)
        undirected = edge_pairs[undirected_mask]
        keys = _pairs_to_keys(edge_pairs, n)
        und_keys = set(keys[undirected_mask].tolist())

        def uniq(mask):
            k = np.unique(keys[mask])
            return k[~np.isin(k, list(und_keys))] if und_keys else k

        directed = _keys_to_pairs(uniq(np.abs(w_ij) > 0), n)
        negative = _keys_to_pairs(
            np.unique(keys[(np.abs(w_ij) == 0) & (np.abs(w_ji) == 0)]), n)

        new_edge_pairs = np.vstack([directed, directed[:, [1, 0]], negative])
        labels = np.concatenate([
            np.zeros(len(directed), np.int32),
            np.ones(len(directed), np.int32),
            np.full(len(negative), 2, np.int32)])
        w_direct = _lookup(A, directed)
        label_weight = np.concatenate([w_direct, w_direct,
                                       np.zeros(len(negative))])
    else:
        undirected = np.zeros((0, 2), np.int64)
        labels = np.ones(len(edge_pairs), np.int32)
        labels[np.abs(w_ij) == 0] = 2
        labels[w_ij < 0] = 0
        new_edge_pairs = edge_pairs
        label_weight = w_ij

    if task == "existence":
        labels = labels.copy()
        labels[labels == 1] = 0
        labels[labels == 2] = 1

    return new_edge_pairs, labels, label_weight, undirected


def link_class_split(data, size: int = None, splits: int = 2,
                     prob_test: float = 0.15, prob_val: float = 0.05,
                     task: str = "direction", seed: int = 0,
                     maintain_connect: bool = True, ratio: float = 1.0,
                     device=None) -> dict:
    """Train/val/test link splits; returns
    ``{i: {'graph', 'weights', 'train'/'val'/'test': {'edges','label'}}}``
    with numpy arrays.  Label semantics per task follow the reference
    docstring (link_split.py:183-200):

      * existence: 0 edge exists, 1 doesn't.
      * direction: 0 (i,j) exists, 1 (j,i) exists.
      * three_class_digraph: 0 / 1 / 2 (neither).
      * sign: 0 negative, 1 positive.
      * four_class_signed_digraph: 0 pos, 1 neg, 2 reversed pos,
        3 reversed neg.
      * five_class_signed_digraph: + 4 (no edge either direction).
    """
    assert task in ("existence", "direction", "three_class_digraph",
                    "four_class_signed_digraph", "five_class_signed_digraph",
                    "sign"), (
        "Please select a valid task from 'existence', 'direction', "
        "'three_class_digraph', 'four_class_signed_digraph', "
        "'five_class_signed_digraph', and 'sign'!")
    edge_index = np.asarray(data.edge_index)
    row, col = edge_index[0], edge_index[1]
    if size is None:
        size = int(max(row.max(), col.max())) + 1
    edge_weight = getattr(data, "edge_weight", None)
    if edge_weight is None:
        edge_weight = np.ones(len(row), np.float32)
    edge_weight = np.asarray(edge_weight)

    A = getattr(data, "A", None)
    if A is not None:
        A = A.tocsr()
    else:
        A = sp.coo_matrix((edge_weight, (row, col)), shape=(size, size),
                          dtype=np.float32).tocsr()

    len_val = int(prob_val * len(row))
    len_test = int(prob_test * len(row))
    signed_tasks = task not in ("existence", "direction", "three_class_digraph")
    if signed_tasks:
        pos_ratio = (A > 0).sum() / len(A.data)
        neg_ratio = 1 - pos_ratio
        len_val_pos = int(np.around(prob_val * len(row) * pos_ratio))
        len_val_neg = int(np.around(prob_val * len(row) * neg_ratio))
        len_test_pos = int(np.around(prob_test * len(row) * pos_ratio))
        len_test_neg = int(np.around(prob_test * len(row) * neg_ratio))

    # undirected edge set for negative sampling
    und_row = np.concatenate([row, col])
    und_col = np.concatenate([col, row])
    und_edge_index = np.unique(
        und_row.astype(np.int64) * size + und_col, axis=0)
    und_edge_index = np.stack([und_edge_index // size, und_edge_index % size])
    rng = np.random.default_rng(seed)
    neg_edges = negative_sampling(und_edge_index, size,
                                  num_neg_samples=edge_index.shape[1],
                                  rng=rng).T
    neg_edges = [tuple(e) for e in neg_edges.tolist()]

    all_edges = [tuple(e) for e in edge_index.T.tolist()]
    if maintain_connect:
        assert ratio == 1, "ratio should be 1.0 if maintain_connect=True"
        A_und = sp.coo_matrix(
            (np.ones(und_edge_index.shape[1]), (und_edge_index[0],
                                                und_edge_index[1])),
            shape=(size, size)).tocsr()
        forest = sp.csgraph.minimum_spanning_tree(A_und).tocoo()
        mst_set = set()
        for i, j in zip(forest.row, forest.col):
            mst_set.add((int(i), int(j)))
            mst_set.add((int(j), int(i)))
        mst = [e for e in mst_set]
        nmst = [e for e in all_edges if e not in mst_set]
        if len(nmst) < (len_val + len_test):
            raise ValueError(
                "There are no enough edges to be removed for "
                "validation/testing. Please use a smaller prob_test or "
                "prob_val.")
    else:
        mst = []
        nmst = list(all_edges)

    rs = np.random.RandomState(seed)
    assert 0 < ratio <= 1.0, "ratio should be smaller than 1.0 and larger than 0"
    assert ratio > prob_val + prob_test, \
        "ratio should be larger than prob_val + prob_test"
    max_samples = int(ratio * edge_index.shape[1]) + 1
    datasets = {}
    for ind in range(splits):
        rs.shuffle(nmst)
        rs.shuffle(neg_edges)

        if not signed_tasks:
            ids_test = nmst[:len_test] + neg_edges[:len_test]
            ids_val = (nmst[len_test:len_test + len_val]
                       + neg_edges[len_test:len_test + len_val])
            if len_test + len_val < len(nmst):
                ids_train = (nmst[len_test + len_val:max_samples] + mst
                             + neg_edges[len_test + len_val:max_samples])
            else:
                ids_train = mst + neg_edges[len_test + len_val:max_samples]
            directed_graph = task != "existence"
            args = (task, directed_graph, False)
        else:
            nmst_arr = np.asarray(nmst)
            wv = _lookup(A, nmst_arr)
            pos_edges_l = [tuple(e) for e in nmst_arr[wv > 0].tolist()]
            neg_edges_l = [tuple(e) for e in nmst_arr[wv < 0].tolist()]
            ids_test = (pos_edges_l[:len_test_pos]
                        + neg_edges_l[:len_test_neg] + neg_edges[:len_test])
            ids_val = (pos_edges_l[len_test_pos:len_test_pos + len_val_pos]
                       + neg_edges_l[len_test_neg:len_test_neg + len_val_neg]
                       + neg_edges[len_test:len_test + len_val])
            if len_test + len_val < len(nmst):
                ids_train = (pos_edges_l[len_test_pos + len_val_pos:max_samples]
                             + neg_edges_l[len_test_neg + len_val_neg:max_samples]
                             + mst
                             + neg_edges[len_test + len_val:max_samples])
            else:
                ids_train = mst + neg_edges[len_test + len_val:max_samples]
            if task == "sign":
                args = (task, False, False)
            else:
                args = (task, True, True)

        ids_test, labels_test, _, _ = undirected_label2directed_label(
            A, ids_test, *args)
        ids_val, labels_val, _, _ = undirected_label2directed_label(
            A, ids_val, *args)
        ids_train, labels_train, _, undirected_train = (
            undirected_label2directed_label(A, ids_train, *args))

        if task in ("direction", "sign"):
            keep = labels_train < 2
            ids_train, labels_train = ids_train[keep], labels_train[keep]
            keep = labels_test < 2
            ids_test, labels_test = ids_test[keep], labels_test[keep]
            keep = labels_val < 2
            ids_val, labels_val = ids_val[keep], labels_val[keep]
        elif task == "four_class_signed_digraph":
            keep = labels_train < 4
            ids_train, labels_train = ids_train[keep], labels_train[keep]
            keep = labels_test < 4
            ids_test, labels_test = ids_test[keep], labels_test[keep]
            keep = labels_val < 4
            ids_val, labels_val = ids_val[keep], labels_val[keep]

        # observed graph: train pairs whose (i, j) direction exists, plus
        # the removed both-direction pairs
        w_train = _lookup(A, ids_train)
        direct = np.abs(w_train) > 0
        observed_edges = ids_train[direct]
        observed_weight = w_train[direct]
        if len(undirected_train) > 0:
            observed_edges = np.vstack([observed_edges, undirected_train])
            observed_weight = np.concatenate(
                [observed_weight, _lookup(A, undirected_train)])

        assert edge_index.shape[1] >= len(observed_edges), (
            f"The original edge number is {edge_index.shape[1]} while the "
            f"observed graph has {len(observed_edges)} edges!")

        datasets[ind] = {
            "graph": observed_edges.T.astype(np.int64),
            "weights": observed_weight.astype(np.float32),
            "train": {"edges": ids_train.astype(np.int64),
                      "label": labels_train.astype(np.int64)},
            "val": {"edges": ids_val.astype(np.int64),
                    "label": labels_val.astype(np.int64)},
            "test": {"edges": ids_test.astype(np.int64),
                     "label": labels_test.astype(np.int64)},
        }
    if device is not None:
        # honor the reference's .to(device) semantics
        # (link_split.py:396-421): place every split array on the given
        # jax device ("cpu"/"tpu" strings or a jax.Device both work)
        import jax

        if isinstance(device, str):
            device = jax.devices(device)[0]
        datasets = jax.tree.map(lambda a: jax.device_put(a, device),
                                datasets)
    return datasets
