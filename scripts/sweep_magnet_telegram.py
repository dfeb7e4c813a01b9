"""MagNet telegram accuracy sweep (runs on the real TPU).

Protocol axes, anchored on the reference example + loader
(/root/reference/examples/magnet_node.py, data/directed/Telegram.py):
features (the loader's N(0,1) scalar | one-hot identity | in-out degree),
activation/dropout, hidden, K, q, lr.  Every config trains all 10 splits
in ONE device call (train.scan_node_training) with on-device val
checkpoint selection; `final_test` is the reference example's rule
(test at the last epoch, no selection).

Usage: python scripts/sweep_magnet_telegram.py [--epochs 1000]
"""
import argparse
import itertools
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
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
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--top", type=int, default=15)
    args = ap.parse_args()

    data = load_directed_real_data("telegram")
    n = data.num_nodes
    y = np.asarray(data.y)
    label_dim = int(y.max()) + 1
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)

    feats = {
        "data": jnp.asarray(np.asarray(data.x, np.float32)),
        "identity": jnp.eye(n, dtype=jnp.float32),
    }
    xd = in_out_degree(data.edge_index, n, edge_weight=data.edge_weight)
    feats["degree"] = jnp.asarray(xd / max(xd.max(), 1.0))

    laps = {q: magnet_propagators(data.edge_index, data.edge_weight, q=q,
                                  num_nodes=n)
            for q in (0.15, 0.25)}

    results = []
    grid = list(itertools.product(
        ("data", "identity", "degree"),           # features
        ((False, 0.0), (True, 0.0), (True, 0.5)),  # activation, dropout
        (16, 64),                                  # hidden
        (1, 2),                                    # K
        (0.15, 0.25),                              # q
        (5e-3, 1e-2),                              # lr
    ))
    t0 = time.time()
    for i, (fname, (act, drop), hidden, K, q, lr) in enumerate(grid):
        x = feats[fname]
        lap = laps[q]
        model = MagNet_node_classification(
            num_features=int(x.shape[1]), hidden=hidden, K=K, q=q,
            label_dim=label_dim, activation=act, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, x, lap, training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, x, lap)

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(lr))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(features=fname, act=act, drop=drop, hidden=hidden, K=K,
                   q=q, lr=lr,
                   best=float(out["best_test"].mean()),
                   best_std=float(out["best_test"].std()),
                   final=float(out["final_test"].mean()))
        results.append(rec)
        print(f"[{i + 1}/{len(grid)} {time.time() - t0:.0f}s] {rec}",
              flush=True)

    results.sort(key=lambda r: -r["best"])
    print("\n=== top configs (val-checkpointed test acc) ===")
    for r in results[: args.top]:
        print(r)


if __name__ == "__main__":
    main()
