"""Joint link sign + direction tasks (4/5-class signed digraph splits).

Equivalent of reference examples/run_link_sign_direction_tasks.py:10,200-210:
``--method`` selects SGCN / SNEA / SiGAT / SDGNN (embedding models trained
on their own loss, evaluated by a multi-class logistic probe on the query
edges), SSSNET_link_prediction or MSGNN_link_prediction (end-to-end NLL on
the query edges).  Tasks: four_class_signed_digraph (pos, neg, reversed
pos, reversed neg), five_class_signed_digraph (+ no-edge), and the
``--direction_only`` degradation (labels // 2).
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_signed_directed_tpu.data import (
    SDSBM, SignedData, load_signed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import (
    in_out_degree, rw_norm_propagator)
from pytorch_geometric_signed_directed_tpu.nn import (
    SGCN, SNEA, SDGNN, SiGAT,
    MSGNN_link_prediction, SSSNET_link_prediction)
from pytorch_geometric_signed_directed_tpu.nn.signed.sgcn import (
    prepare_sgcn_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.snea import (
    prepare_snea_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.sigat import (
    prepare_sigat_inputs)
from pytorch_geometric_signed_directed_tpu.nn.signed.sdgnn import (
    prepare_sdgnn_inputs)
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import (
    link_class_split,
    link_sign_direction_prediction_logistic_function,
    meta_graph_generation,
    negative_sampling,
    structured_negative_sampling,
)

EMBEDDING_METHODS = ("sgcn", "snea", "sigat", "sdgnn")


def _degree_features(g, w, n, kind):
    """Input features for the end-to-end methods (MSGNN/SSSNET).

    ``sd4``: pos/neg-separated unweighted in/out degrees (reference
    --sd_input_feat); ``uw2``: unweighted; ``w4``: signed weighted.
    """
    if kind == "sd4":
        d = SignedData(edge_index=np.asarray(g), edge_weight=np.asarray(w))
        d.separate_positive_negative()
        x1 = in_out_degree(np.asarray(d.edge_index_p), n)
        x2 = in_out_degree(np.asarray(d.edge_index_n), n)
        x = np.concatenate([np.asarray(x1), np.asarray(x2)], axis=1)
    elif kind == "uw2":
        x = np.asarray(in_out_degree(g, n))
    else:
        x = np.asarray(in_out_degree(g, n, signed=True, edge_weight=w))
    x = np.asarray(x, np.float32)
    return jnp.asarray(x / max(np.abs(x).max(), 1.0))


def _train_embedding_model(method, n, edge_index_s, in_dim, out_dim,
                           epochs, lr, weight_decay, seed):
    """SGCN-family training on the model-owned loss; returns embeddings."""
    rng = np.random.default_rng(seed)
    if method == "sgcn":
        pos, neg, emb, Pp, Pn = prepare_sgcn_inputs(n, edge_index_s, in_dim)
        model = SGCN(node_num=n, in_dim=in_dim, out_dim=out_dim, lamb=5,
                     init_emb=emb)
        fwd_args = (Pp, Pn)

        def largs():
            both = np.concatenate([pos, neg], axis=1)
            return (Pp, Pn, pos, neg, negative_sampling(both, n, rng=rng),
                    structured_negative_sampling(pos, n, rng=rng),
                    structured_negative_sampling(neg, n, rng=rng))
    elif method == "snea":
        pos, neg, emb, graphs = prepare_snea_inputs(n, edge_index_s, in_dim)
        model = SNEA(node_num=n, in_dim=in_dim, out_dim=out_dim, lamb=5,
                     init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            both = np.concatenate([pos, neg], axis=1)
            return (graphs, pos, neg, negative_sampling(both, n, rng=rng),
                    structured_negative_sampling(pos, n, rng=rng),
                    structured_negative_sampling(neg, n, rng=rng))
    elif method == "sigat":
        pos, neg, emb, graphs = prepare_sigat_inputs(n, edge_index_s, in_dim)
        model = SiGAT(node_num=n, in_dim=in_dim, out_dim=out_dim,
                      init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            return (graphs, pos, neg)
    else:
        pos, neg, emb, graphs, w_pos, w_neg = prepare_sdgnn_inputs(
            n, edge_index_s, in_dim)
        model = SDGNN(node_num=n, in_dim=in_dim, out_dim=out_dim,
                      init_emb=emb)
        fwd_args = (graphs,)

        def largs():
            return (graphs, pos, neg, w_pos, w_neg)

    params = model.init(jax.random.PRNGKey(seed), *largs(),
                        method=type(model).loss)
    tx = optax.adamw(lr, weight_decay=weight_decay)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, *a):
        loss, grads = jax.value_and_grad(
            lambda pp: model.apply(pp, *a, method=type(model).loss))(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for _ in range(epochs):
        params, opt_state, _ = step(params, opt_state, *largs())
    return np.asarray(model.apply(params, *fwd_args))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="bitcoin_alpha")
    ap.add_argument("--method", default="msgnn",
                    choices=EMBEDDING_METHODS + ("msgnn", "sssnet"))
    ap.add_argument("--num_classes", type=int, default=4, choices=(4, 5))
    ap.add_argument("--direction_only", action="store_true",
                    help="degrade to direction-only labels (y // 2)")
    ap.add_argument("--runs", type=int, default=5,
                    help="number of link splits")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--in_dim", type=int, default=20)
    ap.add_argument("--out_dim", type=int, default=20)
    ap.add_argument("--K", type=int, default=1)
    ap.add_argument("--q", type=float, default=0.0)
    ap.add_argument("--hop", type=int, default=2)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--features", choices=("sd4", "w4", "uw2"),
                    default="sd4")
    ap.add_argument("--train_ratio", type=float, default=0.8)
    ap.add_argument("--num_nodes", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    task = {4: "four_class_signed_digraph",
            5: "five_class_signed_digraph"}[args.num_classes]
    num_classes = args.num_classes
    if args.direction_only:
        num_classes -= 2

    if args.dataset == "synthetic":
        F = meta_graph_generation("cyclic", 3, 0.05, False)
        F[0, 1] = -abs(F[0, 1])
        A, y = SDSBM(args.num_nodes, 3, 0.1, F, eta=0.1,
                     rng=np.random.default_rng(args.seed))
        data = SignedData(A=A, y=y)
    else:
        data = load_signed_real_data(args.dataset)
    n = data.num_nodes
    link_data = link_class_split(
        data, splits=args.runs, task=task, prob_val=0.0,
        prob_test=1.0 - args.train_ratio, seed=args.seed)

    res = np.zeros((args.runs, 3))
    for split in range(args.runs):
        g = np.asarray(link_data[split]["graph"])
        w = np.asarray(link_data[split]["weights"])
        tr_e = np.asarray(link_data[split]["train"]["edges"])
        tr_y = np.asarray(link_data[split]["train"]["label"])
        te_e = np.asarray(link_data[split]["test"]["edges"])
        te_y = np.asarray(link_data[split]["test"]["label"])
        if args.direction_only:
            tr_y, te_y = tr_y // 2, te_y // 2

        if args.method in EMBEDDING_METHODS:
            edge_index_s = np.concatenate(
                [g.T, np.where(w > 0, 1, -1)[:, None].astype(np.int64)],
                axis=1)
            z = _train_embedding_model(
                args.method, n, edge_index_s, args.in_dim, args.out_dim,
                args.epochs, args.lr, args.weight_decay, args.seed)
            acc, f1_macro, f1_micro = \
                link_sign_direction_prediction_logistic_function(
                    z, tr_e, tr_y, te_e, te_y)
        else:
            x = _degree_features(g, w, n, args.features)
            tr_e_j, tr_y_j = jnp.asarray(tr_e), jnp.asarray(tr_y)
            te_e_j = jnp.asarray(te_e)
            if args.method == "msgnn":
                lap = magnet_propagators(g, w, q=args.q, num_nodes=n,
                                         signed=True)
                model = MSGNN_link_prediction(
                    num_features=int(x.shape[1]), hidden=args.hidden,
                    K=args.K, q=args.q, label_dim=num_classes)
                params = model.init(jax.random.PRNGKey(args.seed), x, x,
                                    lap, tr_e_j)

                def loss_fn(p):
                    logp, _ = model.apply(p, x, x, lap, tr_e_j)
                    return -jnp.mean(
                        logp[jnp.arange(tr_e.shape[0]), tr_y_j])

                def predict(p):
                    logp, _ = model.apply(p, x, x, lap, te_e_j)
                    return logp
            else:
                d1 = SignedData(edge_index=g, edge_weight=w)
                d1.separate_positive_negative()
                directed = bool(d1.is_directed)
                P_p = rw_norm_propagator(d1.edge_index_p, d1.edge_weight_p,
                                         n, fill_value=args.tau)
                P_n = rw_norm_propagator(d1.edge_index_n, d1.edge_weight_n,
                                         n, fill_value=0.0)
                P_pt = P_nt = None
                if directed:
                    P_pt = rw_norm_propagator(
                        np.asarray(d1.edge_index_p)[[1, 0]],
                        d1.edge_weight_p, n, fill_value=args.tau)
                    P_nt = rw_norm_propagator(
                        np.asarray(d1.edge_index_n)[[1, 0]],
                        d1.edge_weight_n, n, fill_value=0.0)
                model = SSSNET_link_prediction(
                    nfeat=int(x.shape[1]), hidden=args.hidden,
                    nclass=num_classes, hop=args.hop, fill_value=args.tau,
                    directed=directed)
                params = model.init(jax.random.PRNGKey(args.seed),
                                    P_p, P_n, x, tr_e_j, P_pt, P_nt)

                def loss_fn(p):
                    logp = model.apply(p, P_p, P_n, x, tr_e_j, P_pt, P_nt)
                    return -jnp.mean(
                        logp[jnp.arange(tr_e.shape[0]), tr_y_j])

                def predict(p):
                    return model.apply(p, P_p, P_n, x, te_e_j, P_pt, P_nt)

            trainer = Trainer(loss_fn, lr=args.lr,
                              weight_decay=args.weight_decay)
            state = trainer.fit(trainer.init(params), tuple, args.epochs)
            pred = np.asarray(predict(state.params)).argmax(1)
            from sklearn import metrics

            acc = metrics.accuracy_score(te_y, pred)
            f1_macro = metrics.f1_score(te_y, pred, average="macro")
            f1_micro = metrics.f1_score(te_y, pred, average="micro")

        res[split] = [acc, f1_macro, f1_micro]
        print(f"split {split}: acc {acc:.4f} macro-f1 {f1_macro:.4f} "
              f"micro-f1 {f1_micro:.4f}")

    mean, std = res.mean(0), res.std(0)
    print(f"{args.method} {task}{'_direction_only' * args.direction_only} "
          f"mean acc {mean[0]:.4f} +/- {std[0]:.4f} "
          f"macro-f1 {mean[1]:.4f} micro-f1 {mean[2]:.4f}")


if __name__ == "__main__":
    main()
