"""MagNet link prediction (direction / existence / three-class).

Equivalent of reference examples/magnet_link.py: loader -> link split ->
in/out-degree features -> MagNet trunk -> Adam -> sklearn-style accuracy.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import (
    DSBM, DirectedData, load_directed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import MagNet_link_prediction
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import (
    link_class_split, meta_graph_generation)


def get_data(args):
    if args.dataset == "synthetic":
        F = meta_graph_generation("path", 3, 0.05, False)
        A, y = DSBM(args.num_nodes, 3, 0.3, F,
                    rng=np.random.default_rng(args.seed))
        return DirectedData(A=A, y=y)
    return load_directed_real_data(args.dataset, name=args.name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="telegram")
    ap.add_argument("--name", default="telegram")
    ap.add_argument("--task", default="direction",
                    choices=["direction", "existence", "three_class_digraph"])
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--K", type=int, default=2)
    ap.add_argument("--q", type=float, default=0.25)
    ap.add_argument("--num_classes", type=int, default=None)
    ap.add_argument("--splits", type=int, default=2)
    ap.add_argument("--num_nodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--edge_weights", choices=("binary", "raw", "log"),
                    default="binary",
                    help="transform of the observed-graph edge weights "
                    "(heavy-tailed counts drown the normalized Laplacian; "
                    "see PERF.md telegram findings)")
    args = ap.parse_args(argv)
    label_dim = args.num_classes or (3 if args.task == "three_class_digraph"
                                     else 2)

    data = get_data(args)
    datasets = link_class_split(data, splits=args.splits, task=args.task,
                                seed=args.seed)
    accs = []
    for i in datasets:
        g, w = datasets[i]["graph"], datasets[i]["weights"]
        w = np.asarray(w, np.float32)
        if args.edge_weights == "binary":
            w = np.ones_like(w)
        elif args.edge_weights == "log":
            w = np.log1p(w).astype(np.float32)
        x = in_out_degree(g, data.num_nodes, edge_weight=w)
        x = jnp.asarray(x / max(x.max(), 1.0))
        lap = magnet_propagators(g, w, q=args.q, num_nodes=data.num_nodes)
        tr_e = jnp.asarray(datasets[i]["train"]["edges"])
        tr_y = jnp.asarray(datasets[i]["train"]["label"])
        te_e = jnp.asarray(datasets[i]["test"]["edges"])
        te_y = np.asarray(datasets[i]["test"]["label"])

        model = MagNet_link_prediction(
            num_features=2, hidden=args.hidden, K=args.K, q=args.q,
            label_dim=label_dim, activation=True)
        params = model.init(jax.random.PRNGKey(args.seed), x, x, lap, tr_e)

        def loss_fn(p, _=None):
            logp = model.apply(p, x, x, lap, tr_e)
            return -jnp.mean(logp[jnp.arange(tr_e.shape[0]), tr_y])

        trainer = Trainer(loss_fn, lr=args.lr)
        state = trainer.fit(trainer.init(params), tuple, args.epochs)
        pred = np.asarray(
            model.apply(state.params, x, x, lap, te_e)).argmax(1)
        acc = (pred == te_y).mean()
        accs.append(acc)
        print(f"split {i}: test acc {acc:.4f} "
              f"({state.history['seconds']:.1f}s)")
    print(f"mean test acc: {np.mean(accs):.4f} +/- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
