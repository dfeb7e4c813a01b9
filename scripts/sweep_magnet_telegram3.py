"""MagNet telegram sweep 3: edge-weight transforms.

Telegram's edge weights are heavy-tailed interaction counts; sweeps 1-2
used them raw everywhere, so a handful of giant edges dominate the
sym-normalized magnetic Laplacian.  This sweep crosses weight transforms
(raw / binary / log1p) with the competitive hyperparameter region.
"""
import argparse
import itertools
import time

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
    qs = (0.1, 0.15, 0.2, 0.25)
    results = []
    grid = list(itertools.product(weights, qs, (1, 2), (0.0, 0.5)))
    t0 = time.time()
    for i, (wname, q, K, drop) in enumerate(grid):
        w = weights[wname]
        xd = in_out_degree(data.edge_index, n, edge_weight=w)
        x = jnp.asarray(np.asarray(xd, np.float32) / max(float(xd.max()), 1))
        lap = magnet_propagators(data.edge_index, w, q=q, num_nodes=n)
        model = MagNet_node_classification(
            num_features=2, hidden=64, K=K, q=q, label_dim=label_dim,
            activation=True, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, x, lap, training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, x, lap)

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(5e-3))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(w=wname, q=q, K=K, drop=drop,
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
