"""DGCN node classification (2nd-order in/out proximity, 3-stream conv).

Equivalent of reference examples/dgcn_node.py.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import load_directed_real_data
from pytorch_geometric_signed_directed_tpu.graph import (
    directed_features_in_out, gcn_norm_propagator, in_out_degree)
from pytorch_geometric_signed_directed_tpu.nn import DGCN_node_classification
from pytorch_geometric_signed_directed_tpu.train import Trainer


def build_propagators(data, n):
    idx_und, edge_in, in_w, edge_out, out_w = directed_features_in_out(
        data.edge_index, n, data.edge_weight)
    return (gcn_norm_propagator(idx_und, None, n),
            gcn_norm_propagator(edge_in, in_w, n),
            gcn_norm_propagator(edge_out, out_w, n))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="telegram")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--seed", type=int, default=0)
    # sweep-tuned defaults (scripts/sweep_dgcn_telegram.py): binarized
    # weights + in/out-degree features lift telegram 0.858 -> 0.915+-0.047
    # (the 2nd-order proximity matrices inherit telegram's heavy-tailed
    # raw interaction counts otherwise).  --weights raw --features x
    # reproduces the reference recipe.
    ap.add_argument("--weights", choices=("raw", "binary", "log"),
                    default="binary")
    ap.add_argument("--features", choices=("x", "deg"), default="deg")
    args = ap.parse_args(argv)

    data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    w = np.asarray(data.edge_weight, np.float32)
    if args.weights == "binary":
        w = np.ones_like(w)
    elif args.weights == "log":
        w = np.log1p(w).astype(np.float32)
    data.edge_weight = w
    if args.features == "x" and data.x is not None:
        x = jnp.asarray(np.asarray(data.x, np.float32))
    else:
        xd = in_out_degree(data.edge_index, n, edge_weight=w)
        x = jnp.asarray(np.asarray(xd, np.float32)
                        / max(float(xd.max()), 1.0))
    P_sym, P_in, P_out = build_propagators(data, n)
    y = jnp.asarray(data.y)
    label_dim = int(np.asarray(data.y).max()) + 1

    model = DGCN_node_classification(
        num_features=int(x.shape[1]), hidden=args.hidden,
        label_dim=label_dim, dropout=args.dropout)

    def loss_fn(p, train_mask):
        logp = model.apply(p, x, P_sym, P_in, P_out)
        per_node = -logp[jnp.arange(n), y] * train_mask
        return per_node.sum() / jnp.maximum(train_mask.sum(), 1.0)

    trainer = Trainer(loss_fn, lr=args.lr, weight_decay=args.weight_decay)
    accs = []
    for split in range(data.train_mask.shape[1]):
        train_mask = jnp.asarray(data.train_mask[:, split].astype(np.float32))
        test_idx = np.nonzero(data.test_mask[:, split])[0]
        params = model.init(jax.random.PRNGKey(args.seed + split),
                            x, P_sym, P_in, P_out)
        state = trainer.fit(trainer.init(params), lambda: (train_mask,),
                            args.epochs)
        pred = np.asarray(
            model.apply(state.params, x, P_sym, P_in, P_out)).argmax(1)
        acc = (pred[test_idx] == np.asarray(data.y)[test_idx]).mean()
        accs.append(acc)
        print(f"split {split}: test acc {acc:.4f}")
    print(f"mean test acc: {np.mean(accs):.4f} +/- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
