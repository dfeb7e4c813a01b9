"""MagNet citeseer sweep at the reference protocol (20/class, val 500).

Axes: BOW feature normalization, q (citation graphs favor small q), K,
dropout, hidden, plus degree features for reference.  Every config
trains all 10 splits in one device call.
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
from pytorch_geometric_signed_directed_tpu.nn import (
    MagNet_node_classification)
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import scan_node_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="citeseer")
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    y = np.asarray(data.y)
    label_dim = int(y.max()) + 1
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)

    xr = np.asarray(data.x, np.float32)
    feats = {
        "raw": jnp.asarray(xr),
        "rownorm": jnp.asarray(
            xr / np.maximum(xr.sum(1, keepdims=True), 1e-12)),
    }
    qs = (0.0, 0.05, 0.1, 0.15, 0.25)
    laps = {q: magnet_propagators(data.edge_index, data.edge_weight, q=q,
                                  num_nodes=n) for q in qs}

    results = []
    grid = list(itertools.product(feats, qs, (1, 2), (0.0, 0.5), (16, 64)))
    t0 = time.time()
    for i, (fname, q, K, drop, hidden) in enumerate(grid):
        x = feats[fname]
        lap = laps[q]
        model = MagNet_node_classification(
            num_features=int(x.shape[1]), hidden=hidden, K=K, q=q,
            label_dim=label_dim, activation=True, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, x, lap, training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, x, lap)

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(5e-3))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(f=fname, q=q, K=K, drop=drop, h=hidden,
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
