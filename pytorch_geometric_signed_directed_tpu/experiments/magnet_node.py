"""MagNet node classification (telegram / cora_ml / citeseer / synthetic).

Equivalent of reference examples/magnet_node.py.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import (
    DSBM, DirectedData, load_directed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import MagNet_node_classification
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import meta_graph_generation


def main(argv=None):
    ap = argparse.ArgumentParser()
    # telegram defaults from the TPU sweeps (PERF.md): binary edge
    # weights (telegram's raw weights are heavy-tailed interaction counts
    # that let a few giant edges dominate the sym-normalized Laplacian;
    # binarizing lifts test acc 0.76 -> 0.94), q=0.2, K=2, hidden=64,
    # dropout=0.5, lr=5e-3, wd=5e-4, val-selected checkpoint
    ap.add_argument("--dataset", default="telegram")
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--K", type=int, default=2)
    ap.add_argument("--q", type=float, default=0.2)
    ap.add_argument("--dropout", type=float, default=0.5)
    ap.add_argument("--features", choices=("degree", "data"),
                    default="degree",
                    help="degree: in/out-degree (MagNet-paper style); "
                    "data: the dataset's own x (reference-example style)")
    ap.add_argument("--normalize_features", action="store_true",
                    help="row-normalize x to sum 1 (standard for BOW)")
    ap.add_argument("--edge_weights", choices=("binary", "raw", "log"),
                    default="binary",
                    help="transform of the edge weights used for both the "
                    "Laplacian and the degree features")
    ap.add_argument("--num_nodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.dataset == "synthetic":
        F = meta_graph_generation("cyclic", 5, 0.05, False)
        A, y = DSBM(args.num_nodes, 5, 0.3, F,
                    rng=np.random.default_rng(args.seed))
        data = DirectedData(A=A, y=y)
        data.node_split(train_size_per_class=0.6, val_size_per_class=0.2,
                        data_split=2)
    else:
        data = load_directed_real_data(args.dataset, name=args.dataset)

    n = data.num_nodes
    w = np.asarray(data.edge_weight, np.float32)
    if args.edge_weights == "binary":
        w = np.ones_like(w)
    elif args.edge_weights == "log":
        w = np.log1p(w).astype(np.float32)
    if args.features == "data" and getattr(data, "x", None) is not None:
        x = np.asarray(data.x, np.float32)
        if args.normalize_features:
            x = x / np.maximum(x.sum(1, keepdims=True), 1e-12)
        x = jnp.asarray(x)
    else:
        x = in_out_degree(data.edge_index, n, edge_weight=w)
        x = jnp.asarray(x / max(x.max(), 1.0))
    lap = magnet_propagators(data.edge_index, w, q=args.q, num_nodes=n)
    y = jnp.asarray(data.y)
    label_dim = int(np.asarray(data.y).max()) + 1

    model = MagNet_node_classification(
        num_features=int(x.shape[1]), hidden=args.hidden, K=args.K, q=args.q,
        label_dim=label_dim, activation=True, dropout=args.dropout)

    # masked NLL with the train mask as a batch argument: one jitted step
    # shared by every split (per-split recompiles are expensive on
    # tunneled backends)
    def masked_nll(logp, train_mask):
        per_node = -logp[jnp.arange(x.shape[0]), y] * train_mask
        return per_node.sum() / jnp.maximum(train_mask.sum(), 1.0)

    if args.dropout > 0:
        def loss_fn(p, key, train_mask):
            logp = model.apply(p, x, x, lap, True, rngs={"dropout": key})
            return masked_nll(logp, train_mask)
    else:
        def loss_fn(p, train_mask):
            return masked_nll(model.apply(p, x, x, lap), train_mask)

    def accuracy(p, mask):
        pred = np.asarray(model.apply(p, x, x, lap)).argmax(1)
        return (pred[mask] == np.asarray(data.y)[mask]).mean()

    trainer = Trainer(loss_fn, lr=args.lr, weight_decay=args.weight_decay,
                      rng=args.seed if args.dropout > 0 else None)
    accs = []
    for split in range(data.train_mask.shape[1]):
        train_mask = jnp.asarray(data.train_mask[:, split].astype(np.float32))
        val_idx = np.nonzero(data.val_mask[:, split])[0]
        test_idx = np.nonzero(data.test_mask[:, split])[0]
        params = model.init(jax.random.PRNGKey(args.seed + split), x, x, lap)
        state = trainer.init(params)
        best_val, best_test = -1.0, 0.0
        eval_every = max(args.epochs // 50, 1)
        for epoch in range(args.epochs):
            trainer.step(state, train_mask)
            if (epoch + 1) % eval_every == 0:
                vacc = accuracy(state.params, val_idx)
                if vacc > best_val:
                    best_val = vacc
                    best_test = accuracy(state.params, test_idx)
        accs.append(best_test)
        print(f"split {split}: test acc {best_test:.4f} (val {best_val:.4f})")
    print(f"mean test acc: {np.mean(accs):.4f} +/- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
