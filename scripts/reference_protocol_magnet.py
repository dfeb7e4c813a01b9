"""Root-cause instrument: MagNet at the REFERENCE EXAMPLE's exact recipe.

The reference's examples/magnet_node.py trains MagNet with raw data.x
features, q=0.25, K=1, hidden=16, activation=False, dropout off,
Adam(lr=1e-2, weight_decay=5e-4), 200 epochs, and reports the FINAL
epoch's test accuracy per split (no validation checkpointing).  Our
MagNetConv is numerically parity-tested against the reference's
4-stream recurrence (tests/test_magnet_parity.py), and the loaders bake
the same 20-per-class / val-500 splits (reference
data/directed/citation.py:64,126) — so this script measures what the
reference itself would score, to float tolerance, without torch_geometric
(not installable here).

Usage: python scripts/reference_protocol_magnet.py --dataset citeseer
"""
import argparse
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
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--q", type=float, default=0.25)
    ap.add_argument("--hidden", type=int, default=16)
    args = ap.parse_args()

    data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    y = np.asarray(data.y)
    x = jnp.asarray(np.asarray(data.x, np.float32))
    tr = np.asarray(data.train_mask).T.astype(np.float32)
    va = np.asarray(data.val_mask).T.astype(np.float32)
    te = np.asarray(data.test_mask).T.astype(np.float32)
    lap = magnet_propagators(data.edge_index, data.edge_weight, q=args.q,
                             num_nodes=n)
    model = MagNet_node_classification(
        num_features=int(x.shape[1]), hidden=args.hidden, K=args.K,
        q=args.q, label_dim=int(y.max()) + 1, activation=False, dropout=0.0)

    def apply_fn(p, training, key):
        return model.apply(p, x, x, lap)

    def init_fn(key):
        return model.init(key, x, x, lap)

    # torch Adam(weight_decay) = L2 added to the gradient before Adam
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.adam(args.lr))
    t0 = time.time()
    out = scan_node_training(apply_fn, init_fn, y, tr, va, te,
                             epochs=args.epochs, tx=tx, seed=0,
                             stochastic=False)
    fin = out["final_test"]
    best = out["best_test"]
    print(f"{args.dataset} @ reference recipe (q={args.q}, K={args.K}, "
          f"h={args.hidden}, {args.epochs} epochs, {time.time()-t0:.0f}s)")
    print(f"  final-epoch test acc (what the reference example reports): "
          f"{np.mean(fin):.4f} +/- {np.std(fin):.4f}")
    print(f"  val-checkpointed test acc (not used by the reference): "
          f"{np.mean(best):.4f} +/- {np.std(best):.4f}")


if __name__ == "__main__":
    main()
