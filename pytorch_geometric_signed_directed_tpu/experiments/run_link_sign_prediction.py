"""Link sign prediction with the SGCN family (SGCN/SNEA/SiGAT/SDGNN).

Equivalent of reference examples/run_link_sign_prediction.py: real signed
graph -> sign link split -> model-owned training loss -> frozen embeddings
-> sklearn logistic regression metrics.
"""
import argparse

import numpy as np
import jax
import optax

from pytorch_geometric_signed_directed_tpu.data import load_signed_real_data
from pytorch_geometric_signed_directed_tpu.nn import SGCN, SNEA, SDGNN, SiGAT
from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
    prepare_sgcn_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.snea import (
    prepare_snea_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
    prepare_sigat_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
    prepare_sdgnn_inputs)
from pytorch_geometric_signed_directed_tpu.utils import (
    link_class_split,
    link_sign_prediction_logistic_function,
    negative_sampling,
    structured_negative_sampling,
)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="bitcoin_alpha")
    ap.add_argument("--model", default="sgcn",
                    choices=["sgcn", "snea", "sigat", "sdgnn"])
    ap.add_argument("--emb_dim", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    data = load_signed_real_data(args.dataset)
    data.to_unweighted()
    n = data.num_nodes
    datasets = link_class_split(data, splits=1, task="sign", seed=args.seed,
                                maintain_connect=False)
    tr = datasets[0]["train"]
    te = datasets[0]["test"]
    train_edges = np.asarray(tr["edges"])
    train_y = np.asarray(tr["label"])
    edge_index_s = np.concatenate(
        [train_edges, np.where(train_y == 1, 1, -1)[:, None]], axis=1)

    rng = np.random.default_rng(args.seed)
    d = args.emb_dim
    if args.model == "sgcn":
        pos, neg, emb, Pp, Pn = prepare_sgcn_inputs(n, edge_index_s, d)
        model = SGCN(node_num=n, in_dim=d, out_dim=d, init_emb=emb)
        fwd_args = (Pp, Pn)

        def largs():
            both = np.concatenate([pos, neg], axis=1)
            return (Pp, Pn, pos, neg, negative_sampling(both, n, rng=rng),
                    structured_negative_sampling(pos, n, rng=rng),
                    structured_negative_sampling(neg, n, rng=rng))
    elif args.model == "snea":
        pos, neg, emb, graphs = prepare_snea_inputs(n, edge_index_s, d)
        model = SNEA(node_num=n, in_dim=d, out_dim=d, init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            both = np.concatenate([pos, neg], axis=1)
            return (graphs, pos, neg, negative_sampling(both, n, rng=rng),
                    structured_negative_sampling(pos, n, rng=rng),
                    structured_negative_sampling(neg, n, rng=rng))
    elif args.model == "sigat":
        pos, neg, emb, graphs = prepare_sigat_inputs(n, edge_index_s, d)
        model = SiGAT(node_num=n, in_dim=d, out_dim=d, init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            return (graphs, pos, neg)
    else:
        pos, neg, emb, graphs, w_pos, w_neg = prepare_sdgnn_inputs(
            n, edge_index_s, d)
        model = SDGNN(node_num=n, in_dim=d, out_dim=d, init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            return (graphs, pos, neg, w_pos, w_neg)

    params = model.init(jax.random.PRNGKey(args.seed), *largs(),
                        method=type(model).loss)
    tx = optax.adamw(args.lr, weight_decay=args.weight_decay)
    opt_state = tx.init(params)
    step = jax.jit(lambda p, s, *a: _step(model, tx, p, s, *a))

    def _step(model, tx, p, s, *a):
        loss, grads = jax.value_and_grad(
            lambda pp: model.apply(pp, *a, method=type(model).loss))(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, *largs())
        if (epoch + 1) % 50 == 0:
            print(f"epoch {epoch + 1}: loss {float(loss):.4f}")

    z = np.asarray(model.apply(params, *fwd_args))
    acc, f1, f1_macro, f1_micro, auc = \
        link_sign_prediction_logistic_function(
            z, train_edges, train_y, np.asarray(te["edges"]),
            np.asarray(te["label"]))
    print(f"acc {acc:.4f}  f1 {f1:.4f}  macro {f1_macro:.4f}  "
          f"micro {f1_micro:.4f}  auc {auc:.4f}")


if __name__ == "__main__":
    main()
