"""DiGCL link prediction: contrastive embeddings + logistic regression.

Equivalent of reference examples/digcl_link.py: per-split link_class_split
graphs (prob_val 0.15 / prob_test 0.05, direction task), in/out-degree
features of the split graph (in_channels = 2), hidden 32 / proj 16 /
tau 0.5, and the same hardcoded a = 0.9, b = 0.1 alpha_2 curriculum as
digcl_node (default "log", which visits alpha > 1).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_signed_directed_tpu.data import load_directed_real_data
from pytorch_geometric_signed_directed_tpu.graph import (
    gcn_norm_propagator, in_out_degree)
from pytorch_geometric_signed_directed_tpu.nn import DiGCL
from pytorch_geometric_signed_directed_tpu.spectral import cal_fast_appr
from pytorch_geometric_signed_directed_tpu.utils import (
    drop_feature, link_class_split, pred_digcl_link)

from .digcl_node import curriculum_alpha


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="webkb/cornell")
    ap.add_argument("--task", default="direction",
                    choices=["direction", "existence"])
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--proj_hidden", type=int, default=16)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--alpha_1", type=float, default=0.1)
    ap.add_argument("--drop_feature_rate_1", type=float, default=0.3)
    ap.add_argument("--drop_feature_rate_2", type=float, default=0.4)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--curr_type", default="log",
                    choices=["linear", "exp", "log", "fixed"])
    ap.add_argument("--splits", type=int, default=2,
                    help="number of link splits (reference default 2)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if "/" in args.dataset:
        ds, name = args.dataset.split("/")
    else:
        ds = name = args.dataset
    data = load_directed_real_data(ds, name=name)
    n = data.num_nodes
    datasets = link_class_split(data, splits=args.splits, prob_val=0.15,
                                prob_test=0.05, task=args.task,
                                seed=args.seed)

    # in/out-degree features of the split graph: 2 columns (reference
    # examples/digcl_link.py:57 builds DiGCL with in_channels=2)
    model = DiGCL(in_channels=2, activation="relu",
                  num_hidden=args.hidden, num_proj_hidden=args.proj_hidden,
                  tau=args.tau, num_layers=2)
    tx = optax.chain(optax.add_decayed_weights(args.weight_decay),
                     optax.adam(args.lr))

    @jax.jit
    def step(params, opt_state, x1, x2, Pa, Pb):
        def loss_fn(p):
            z1 = model.apply(p, x1, Pa)
            z2 = model.apply(p, x2, Pb)
            return model.apply(p, z1, z2, method=DiGCL.loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    accs = []
    for split in range(args.splits):
        g, w = datasets[split]["graph"], datasets[split]["weights"]
        # Unweighted in/out-degree features, matching the reference
        # example (examples/digcl_link.py:68 passes no edge_weight).
        x = jnp.asarray(np.asarray(in_out_degree(g, n), np.float32))
        ei1, w1 = cal_fast_appr(args.alpha_1, g, n, w)
        P1 = gcn_norm_propagator(ei1, w1, n, mode="dense")

        key, init_key = jax.random.split(key)
        params = model.init(init_key, x, P1, method=DiGCL.warmup)
        opt_state = tx.init(params)
        view_cache = {}
        for epoch in range(args.epochs):
            a = float(curriculum_alpha(args.curr_type, epoch, args.epochs))
            if a not in view_cache:
                ei2, w2 = cal_fast_appr(a, g, n, w)
                view_cache[a] = gcn_norm_propagator(ei2, w2, n, mode="dense")
            P2 = view_cache[a]
            key, k1, k2 = jax.random.split(key, 3)
            x1 = drop_feature(x, args.drop_feature_rate_1, k1)
            x2 = drop_feature(x, args.drop_feature_rate_2, k2)
            params, opt_state, loss = step(params, opt_state, x1, x2, P1, P2)
            if (epoch + 1) % 50 == 0:
                print(f"split {split} epoch {epoch + 1}: "
                      f"loss {float(loss):.4f}")

        z = np.asarray(model.apply(params, x, P1))
        tr_e = np.asarray(datasets[split]["train"]["edges"])
        tr_y = np.asarray(datasets[split]["train"]["label"])
        te_e = np.asarray(datasets[split]["test"]["edges"])
        te_y = np.asarray(datasets[split]["test"]["label"])
        pred = pred_digcl_link(z, tr_y, tr_e, te_e)
        acc = (pred == te_y).mean()
        accs.append(acc)
        print(f"split {split}: logistic test acc {acc:.4f}")

    accs = np.asarray(accs)
    print(f"{args.dataset} DiGCL {args.task} ({args.curr_type}): "
          f"acc {accs.mean():.4f} +/- {accs.std():.4f} over {len(accs)} splits")


if __name__ == "__main__":
    main()
