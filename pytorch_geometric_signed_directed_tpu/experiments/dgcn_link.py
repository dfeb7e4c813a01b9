"""DGCN link prediction (direction / existence / three-class).

Equivalent of reference examples/dgcn_link.py: the 3-stream propagators
are rebuilt from each split's observed graph.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import (
    DSBM, DirectedData, load_directed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import (
    directed_features_in_out, gcn_norm_propagator, in_out_degree)
from pytorch_geometric_signed_directed_tpu.nn import DGCN_link_prediction
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import (
    link_class_split, meta_graph_generation)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="telegram")
    ap.add_argument("--task", default="direction",
                    choices=["direction", "existence", "three_class_digraph"])
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--splits", type=int, default=2)
    ap.add_argument("--num_nodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    label_dim = 3 if args.task == "three_class_digraph" else 2

    if args.dataset == "synthetic":
        F = meta_graph_generation("path", 3, 0.05, False)
        A, y = DSBM(args.num_nodes, 3, 0.3, F,
                    rng=np.random.default_rng(args.seed))
        data = DirectedData(A=A, y=y)
    else:
        data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    datasets = link_class_split(data, splits=args.splits, task=args.task,
                                seed=args.seed)
    accs = []
    for i in datasets:
        g, w = datasets[i]["graph"], datasets[i]["weights"]
        x = in_out_degree(g, n, edge_weight=w)
        x = jnp.asarray(x / max(x.max(), 1.0))
        idx_und, edge_in, in_w, edge_out, out_w = directed_features_in_out(
            g, n, w)
        P_sym = gcn_norm_propagator(idx_und, None, n)
        P_in = gcn_norm_propagator(edge_in, in_w, n)
        P_out = gcn_norm_propagator(edge_out, out_w, n)
        tr_e = jnp.asarray(datasets[i]["train"]["edges"])
        tr_y = jnp.asarray(datasets[i]["train"]["label"])
        te_e = jnp.asarray(datasets[i]["test"]["edges"])
        te_y = np.asarray(datasets[i]["test"]["label"])

        model = DGCN_link_prediction(num_features=2, hidden=args.hidden,
                                     label_dim=label_dim)
        params = model.init(jax.random.PRNGKey(args.seed),
                            x, P_sym, P_in, P_out, tr_e)

        def loss_fn(p, _=None):
            logp = model.apply(p, x, P_sym, P_in, P_out, tr_e)
            return -jnp.mean(logp[jnp.arange(tr_e.shape[0]), tr_y])

        trainer = Trainer(loss_fn, lr=args.lr,
                          weight_decay=args.weight_decay)
        state = trainer.fit(trainer.init(params), tuple, args.epochs)
        pred = np.asarray(
            model.apply(state.params, x, P_sym, P_in, P_out, te_e)).argmax(1)
        acc = (pred == te_y).mean()
        accs.append(acc)
        print(f"split {i}: test acc {acc:.4f}")
    print(f"mean test acc: {np.mean(accs):.4f} +/- {np.std(accs):.4f}")


if __name__ == "__main__":
    main()
