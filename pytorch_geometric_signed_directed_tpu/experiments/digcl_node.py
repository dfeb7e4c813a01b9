"""DiGCL contrastive node representation learning.

Equivalent of reference examples/digcl_node.py: two PPR views with an
alpha curriculum, InfoNCE loss, frozen-embedding logistic regression.
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
    drop_feature, pred_digcl_node)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="telegram")
    ap.add_argument("--alpha_1", type=float, default=0.1)
    ap.add_argument("--alpha_2", type=float, default=0.3)
    ap.add_argument("--drop_rate", type=float, default=0.3)
    # reference examples/digcl_node.py:18 uses a second (stronger) drop
    # rate for the curriculum view
    ap.add_argument("--drop_rate_2", type=float, default=0.4)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--proj_hidden", type=int, default=64)
    ap.add_argument("--tau", type=float, default=0.4)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--curr_type", default="linear",
                    choices=["linear", "exp", "log", "fixed"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    data = load_directed_real_data(args.dataset, name=args.dataset)
    n = data.num_nodes
    if data.x is not None:
        x = jnp.asarray(np.asarray(data.x, np.float32))
    else:
        x = jnp.asarray(in_out_degree(data.edge_index, n,
                                      edge_weight=data.edge_weight))

    ei1, w1 = cal_fast_appr(args.alpha_1, data.edge_index, n,
                            data.edge_weight)
    P1 = gcn_norm_propagator(ei1, w1, n, mode="dense")

    model = DiGCL(in_channels=x.shape[1], activation="relu",
                  num_hidden=args.hidden, num_proj_hidden=args.proj_hidden,
                  tau=args.tau, num_layers=2)
    params = model.init(jax.random.PRNGKey(args.seed), x, P1,
                        method=DiGCL.warmup)
    tx = (optax.chain(optax.add_decayed_weights(args.weight_decay),
                      optax.adam(args.lr))
          if args.weight_decay else optax.adam(args.lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x1, x2, Pa, Pb):
        def loss_fn(p):
            z1 = model.apply(p, x1, Pa)
            z2 = model.apply(p, x2, Pb)
            return model.apply(p, z1, z2, method=DiGCL.loss)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def curriculum(epoch):
        t = epoch / max(args.epochs, 1)
        if args.curr_type == "linear":
            return args.alpha_1 + (args.alpha_2 - args.alpha_1) * t
        if args.curr_type == "exp":
            return args.alpha_1 + (args.alpha_2 - args.alpha_1) * (
                np.expm1(t) / np.expm1(1.0))
        if args.curr_type == "log":
            return args.alpha_1 + (args.alpha_2 - args.alpha_1) * np.log1p(
                t * (np.e - 1))
        return args.alpha_2

    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        a = float(curriculum(epoch))
        ei2, w2 = cal_fast_appr(a, data.edge_index, n, data.edge_weight)
        P2 = gcn_norm_propagator(ei2, w2, n, mode="dense")
        key, k1, k2 = jax.random.split(key, 3)
        x1 = drop_feature(x, args.drop_rate, k1)
        x2 = drop_feature(x, args.drop_rate_2, k2)
        params, opt_state, loss = step(params, opt_state, x1, x2, P1, P2)
        if (epoch + 1) % 20 == 0:
            print(f"epoch {epoch + 1}: loss {float(loss):.4f}")

    z = np.asarray(model.apply(params, x, P1))
    split = 0
    train_idx = np.nonzero(data.train_mask[:, split])[0]
    test_idx = np.nonzero(data.test_mask[:, split])[0]
    pred = pred_digcl_node(z, np.asarray(data.y), train_idx, test_idx)
    acc = (pred == np.asarray(data.y)[test_idx]).mean()
    print(f"logistic-regression test acc: {acc:.4f}")


if __name__ == "__main__":
    main()
