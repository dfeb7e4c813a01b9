"""MagNet citeseer sweep 2 (reference protocol): refine around q=0.

Sweep 1 found q=0 / raw BOW best (0.622).  This sweep extends lr, K,
hidden, dropout, and a BOW+degree feature concat at q in {0, 0.05}.
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
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import (
    MagNet_node_classification)
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import scan_node_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    data = load_directed_real_data("citeseer", name="citeseer")
    n = data.num_nodes
    y = np.asarray(data.y)
    label_dim = int(y.max()) + 1
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)

    xr = np.asarray(data.x, np.float32)
    xd = np.asarray(in_out_degree(data.edge_index, n,
                                  edge_weight=data.edge_weight), np.float32)
    xd = xd / max(xd.max(), 1.0)
    feats = {
        "raw": jnp.asarray(xr),
        "raw+deg": jnp.asarray(np.concatenate([xr, xd], axis=1)),
    }
    qs = (0.0, 0.05)
    laps = {q: magnet_propagators(data.edge_index, data.edge_weight, q=q,
                                  num_nodes=n) for q in qs}

    results = []
    grid = list(itertools.product(feats, qs, (1, 2, 3), (0.5, 0.7),
                                  (64, 128), (1e-2, 5e-3, 2e-3)))
    t0 = time.time()
    for i, (fname, q, K, drop, hidden, lr) in enumerate(grid):
        x = feats[fname]
        model = MagNet_node_classification(
            num_features=int(x.shape[1]), hidden=hidden, K=K, q=q,
            label_dim=label_dim, activation=True, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, x, laps[q], training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, x, laps[q])

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(lr))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=True)
        rec = dict(f=fname, q=q, K=K, drop=drop, h=hidden, lr=lr,
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
