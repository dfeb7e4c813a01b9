"""DGCN telegram sweep: weight transform x features x dropout x epochs.

DGCN's 2nd-order in/out proximity matrices are built from the edge
weights (reference utils/directed/features_in_out.py), so telegram's
heavy-tailed interaction counts distort them the same way they distorted
the magnetic Laplacian (MagNet sweep) and the PPR adjacency (DiGCN
sweep).  Round-1 tuned recipe measured 0.858 +- 0.044.
"""
import argparse
import itertools
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import optax

from pytorch_geometric_signed_directed_tpu.data import (
    load_directed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import (
    directed_features_in_out, gcn_norm_propagator, in_out_degree)
from pytorch_geometric_signed_directed_tpu.nn import DGCN_node_classification
from pytorch_geometric_signed_directed_tpu.train import scan_node_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    data = load_directed_real_data("telegram")
    n = data.num_nodes
    y = np.asarray(data.y)
    label_dim = int(y.max()) + 1
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)

    w_raw = np.asarray(data.edge_weight, np.float32)
    weights = {
        "raw": w_raw,
        "binary": np.ones_like(w_raw),
        "log": np.log1p(w_raw).astype(np.float32),
    }
    feats = ("x", "deg")
    drops = (0.5, 0.8)
    hiddens = (16, 32)
    results = []
    grid = list(itertools.product(weights, feats, drops, hiddens))
    t0 = time.time()
    for i, (wname, fname, drop, hidden) in enumerate(grid):
        w = weights[wname]
        if fname == "x" and data.x is not None:
            x = jnp.asarray(np.asarray(data.x, np.float32))
        else:
            xd = in_out_degree(data.edge_index, n, edge_weight=w)
            x = jnp.asarray(np.asarray(xd, np.float32)
                            / max(float(xd.max()), 1.0))
        idx_und, edge_in, in_w, edge_out, out_w = directed_features_in_out(
            data.edge_index, n, w)
        P_sym = gcn_norm_propagator(idx_und, None, n)
        P_in = gcn_norm_propagator(edge_in, in_w, n)
        P_out = gcn_norm_propagator(edge_out, out_w, n)
        model = DGCN_node_classification(
            num_features=int(x.shape[1]), hidden=hidden,
            label_dim=label_dim, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, P_sym, P_in, P_out, training,
                               rngs=rngs)

        def init_fn(key):
            return model.init(key, x, P_sym, P_in, P_out)

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-2))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(w=wname, feat=fname, drop=drop, hidden=hidden,
                   best=float(out["best_test"].mean()),
                   std=float(out["best_test"].std()),
                   final=float(out["final_test"].mean()))
        results.append(rec)
        print(f"[{i + 1}/{len(grid)} {time.time() - t0:.0f}s] {rec}",
              flush=True)

    results.sort(key=lambda r: -r["best"])
    print("\n=== top configs ===")
    for r in results[: args.top]:
        print(r)


if __name__ == "__main__":
    main()
