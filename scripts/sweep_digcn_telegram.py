"""DiGCN inception telegram sweep: features x weight transform x alpha.

The reference recipe (examples/digcn_inception_node.py: hidden 16,
lr 1e-2, wd 5e-4, dropout 0.5, alpha 0.1) runs telegram with its baked-in
1-dim N(0,1) random features (data/directed/Telegram.py:64-65) and raw
heavy-tailed interaction-count edge weights.  The MagNet telegram sweep
showed binarized weights fix the operator conditioning; this sweep
crosses that with the feature source and the PPR teleport alpha.
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
    in_out_degree, norm_propagator)
from pytorch_geometric_signed_directed_tpu.nn import (
    DiGCN_Inception_Block_node_classification)
from pytorch_geometric_signed_directed_tpu.spectral import (
    appr_directed_adj, second_directed_adj)
from pytorch_geometric_signed_directed_tpu.train import scan_node_training


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=32)
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
    alphas = (0.05, 0.1, 0.2)
    drops = (0.5, 0.8)
    results = []
    grid = list(itertools.product(weights, feats, alphas, drops))
    t0 = time.time()
    for i, (wname, fname, alpha, drop) in enumerate(grid):
        w = weights[wname]
        if fname == "x" and data.x is not None:
            x = jnp.asarray(np.asarray(data.x, np.float32))
        else:
            xd = in_out_degree(data.edge_index, n, edge_weight=w)
            x = jnp.asarray(np.asarray(xd, np.float32)
                            / max(float(xd.max()), 1.0))
        ei1, w1 = appr_directed_adj(alpha, data.edge_index, n, w)
        ei2, w2 = second_directed_adj(data.edge_index, n, w)
        P1 = norm_propagator(ei1, w1, n)
        P2 = norm_propagator(ei2, w2, n)
        model = DiGCN_Inception_Block_node_classification(
            num_features=x.shape[1], hidden=args.hidden,
            label_dim=label_dim, dropout=drop)

        def apply_fn(p, training, key):
            rngs = {"dropout": key} if key is not None else None
            return model.apply(p, x, P1, P2, training, rngs=rngs)

        def init_fn(key):
            return model.init(key, x, P1, P2)

        tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(1e-2))
        out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                                 epochs=args.epochs, tx=tx, seed=0,
                                 stochastic=drop > 0)
        rec = dict(w=wname, feat=fname, alpha=alpha, drop=drop,
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
