"""MagNet telegram deep sweep: degree-feature family, paper-length training.

Round-1 sweeps plateaued ~0.75-0.76 at 1000 epochs; the MagNet paper
reports ~0.876 with 3000-epoch training.  This sweep explores the axes the
first pass fixed: longer training, feature scaling (max / standardize /
log1p), weight decay on/off, finer q grid.
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
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    data = load_directed_real_data("telegram")
    n = data.num_nodes
    y = np.asarray(data.y)
    label_dim = int(y.max()) + 1
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)

    xd = in_out_degree(data.edge_index, n, edge_weight=data.edge_weight)
    xd = np.asarray(xd, np.float32)
    feats = {
        "max": jnp.asarray(xd / xd.max()),
        "std": jnp.asarray((xd - xd.mean(0)) / (xd.std(0) + 1e-9)),
        "log": jnp.asarray(np.log1p(xd) / np.log1p(xd).max()),
    }
    qs = (0.05, 0.1, 0.15, 0.2, 0.25)
    laps = {q: magnet_propagators(data.edge_index, data.edge_weight, q=q,
                                  num_nodes=n) for q in qs}

    results = []
    grid = list(itertools.product(
        ("max", "std", "log"),
        qs,
        (1, 2),           # K
        (0.0, 0.5),       # dropout (act always on)
        ((1e-3, 5e-4), (5e-3, 5e-4), (5e-3, 0.0)),  # (lr, wd)
    ))
    t0 = time.time()
    for i, (fname, q, K, drop, (lr, wd)) in enumerate(grid):
        x = feats[fname]
        lap = laps[q]
        model = MagNet_node_classification(
            num_features=2, hidden=64, K=K, q=q, label_dim=label_dim,
            activation=True, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, x, lap, training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, x, lap)

        tx = (optax.chain(optax.add_decayed_weights(wd), optax.adam(lr))
              if wd else optax.adam(lr))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(f=fname, q=q, K=K, drop=drop, lr=lr, wd=wd,
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
