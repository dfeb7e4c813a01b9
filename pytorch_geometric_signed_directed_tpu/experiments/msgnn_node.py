"""MSGNN node classification / clustering on signed directed graphs.

Equivalent of reference examples/msgnn_node.py: SDSBM synthetic by
default (signed meta-graph), NLL on labelled splits.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import (
    SDSBM, SignedData, load_signed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import MSGNN_node_classification
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import meta_graph_generation


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--q", type=float, default=0.25)
    ap.add_argument("--num_nodes", type=int, default=1000)
    ap.add_argument("--eta", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.dataset == "synthetic":
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        F[0, 1] = -abs(F[0, 1])
        F[1, 0] = -abs(F[1, 0])
        A, y = SDSBM(args.num_nodes, 3, 0.1, F, eta=args.eta,
                     rng=np.random.default_rng(args.seed))
        data = SignedData(A=A, y=y)
    else:
        data = load_signed_real_data(args.dataset)
    data.node_split(train_size_per_class=0.6, val_size_per_class=0.2,
                    data_split=2)
    n = data.num_nodes
    x = in_out_degree(data.edge_index, n, signed=True,
                      edge_weight=data.edge_weight)
    x = jnp.asarray(x / max(np.abs(x).max(), 1.0))
    lap = magnet_propagators(data.edge_index, data.edge_weight, q=args.q,
                             num_nodes=n, signed=True)
    y = jnp.asarray(data.y)
    label_dim = int(np.asarray(data.y).max()) + 1

    model = MSGNN_node_classification(
        num_features=4, hidden=args.hidden, K=args.K, q=args.q,
        label_dim=label_dim)

    def loss_fn(p, train_mask):
        _, logp, _, _ = model.apply(p, x, x, lap)
        per_node = -logp[jnp.arange(n), y] * train_mask
        return per_node.sum() / jnp.maximum(train_mask.sum(), 1.0)

    trainer = Trainer(loss_fn, lr=args.lr, weight_decay=args.weight_decay)
    accs = []
    for split in range(data.train_mask.shape[1]):
        train_mask = jnp.asarray(data.train_mask[:, split].astype(np.float32))
        test_idx = np.nonzero(data.test_mask[:, split])[0]
        params = model.init(jax.random.PRNGKey(args.seed + split), x, x, lap)
        state = trainer.fit(trainer.init(params), lambda: (train_mask,),
                            args.epochs)
        _, logp, _, _ = model.apply(state.params, x, x, lap)
        pred = np.asarray(logp).argmax(1)
        acc = (pred[test_idx] == np.asarray(data.y)[test_idx]).mean()
        accs.append(acc)
        print(f"split {split}: test acc {acc:.4f}")
    print(f"mean test acc: {np.mean(accs):.4f} +/- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
