"""DIGRAC self-supervised directed clustering.

Equivalent of reference examples/digrac_node.py: DIMPA trunk +
probabilistic imbalance loss, ARI against planted clusters on DSBM.

Real data (--dataset blog/migration/wikitalk/lead_lag20xx — the graphs
DIGRAC_real_data exists for, reference
data/directed/DIGRAC_real_data.py:9-59) carries no labels, so training
is purely self-supervised: we report the final imbalance loss and the
corresponding imbalance score (1 - loss; 0 = uniform/random clustering,
1 = perfectly imbalanced flows), the DIGRAC paper's own objective family
(reference utils/directed/prob_imbalance_loss.py:104-117), with a
'complete' meta-graph prior.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import DSBM, DirectedData
from pytorch_geometric_signed_directed_tpu.graph import (
    in_out_degree, norm_propagator, rw_norm_propagator)
from pytorch_geometric_signed_directed_tpu.nn import DIGRAC_node_clustering
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import (
    Prob_Imbalance_Loss, meta_graph_generation)


def main(argv=None):
    ap = argparse.ArgumentParser()
    # "dsbm" reproduces the reference example (synthetic, ARI vs planted
    # clusters); real names dispatch through load_directed_real_data
    ap.add_argument("--dataset", default="dsbm")
    ap.add_argument("--N", type=int, default=500)
    ap.add_argument("--K", type=int, default=3)
    ap.add_argument("--p", type=float, default=0.1)
    ap.add_argument("--eta", type=float, default=0.05)
    ap.add_argument("--F_style", default="cyclic")
    ap.add_argument("--hop", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--features", default="hermitian",
                    choices=["hermitian", "degree"])
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--normalization", default="vol_sum")
    ap.add_argument("--threshold", default="sort")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.dataset == "dsbm":
        F = meta_graph_generation(args.F_style, args.K, args.eta, False)
        A, labels = DSBM(args.N, args.K, args.p, F,
                         rng=np.random.default_rng(args.seed))
        data = DirectedData(A=A, y=labels)
    else:
        from pytorch_geometric_signed_directed_tpu.data import (
            load_directed_real_data)

        data = load_directed_real_data(args.dataset)
        labels = None
        # self-supervised prior: all ordered pairs are candidate
        # imbalanced flows (the DIGRAC paper's real-data setting)
        F = meta_graph_generation("complete", args.K, 0.0, False)
    n = data.num_nodes
    if args.features == "hermitian":
        # directional spectral features — the signal DIGRAC's imbalance
        # objective needs to escape the uniform-cluster local optimum
        data.set_hermitian_features(k=args.K)
        x = jnp.asarray(np.asarray(data.x, np.float32))
    else:
        x = in_out_degree(data.edge_index, n, edge_weight=data.edge_weight)
        x = jnp.asarray(x / max(x.max(), 1.0))
    P_s = rw_norm_propagator(data.edge_index, data.edge_weight, n)
    P_t = rw_norm_propagator(data.edge_index[[1, 0]], data.edge_weight, n)
    # raw adjacency + transpose as sparse propagators for the imbalance
    # volumes — never densify A (wikitalk is N=2.39M; same pair form the
    # bench path uses, parity-tested vs dense in
    # tests/test_models_directed.py::TestDIGRAC)
    P_A = norm_propagator(data.edge_index[[1, 0]], data.edge_weight, n)
    P_AT = norm_propagator(data.edge_index, data.edge_weight, n)

    imb = Prob_Imbalance_Loss(F)
    model = DIGRAC_node_clustering(num_features=x.shape[1],
                                   hidden=args.hidden,
                                   nclass=args.K, fill_value=0.5,
                                   dropout=args.dropout, hop=args.hop)
    params = model.init(jax.random.PRNGKey(args.seed), P_s, P_t, x)

    def loss_fn(p, P_s, P_t, P_A, P_AT, x):
        # graph operators ride as batch args, not closure constants — at
        # wikitalk scale the 10M-edge scatter plans would otherwise bake
        # into the HLO as constants and bloat the program
        _, _, _, prob = model.apply(p, P_s, P_t, x)
        return imb(prob, (P_A, P_AT), args.K, args.normalization,
                   args.threshold)

    batch = (P_s, P_t, P_A, P_AT, x)
    trainer = Trainer(loss_fn, lr=args.lr)
    state = trainer.fit(trainer.init(params), lambda: batch, args.epochs)

    _, _, pred, prob = model.apply(state.params, P_s, P_t, x)
    final = float(loss_fn(state.params, *batch))
    sizes = np.bincount(np.asarray(pred), minlength=args.K)
    if labels is not None:
        from sklearn.metrics import adjusted_rand_score

        ari = adjusted_rand_score(labels, np.asarray(pred))
        print(f"ARI {ari:.4f}  imbalance loss {final:.4f} "
              f"({state.history['seconds']:.1f}s)")
    else:
        print(f"{args.dataset}: imbalance loss {final:.4f}  "
              f"score {1.0 - final:.4f}  "
              f"({args.normalization}/{args.threshold}, K={args.K}, "
              f"clusters used {int((sizes > 0).sum())}/{args.K}, "
              f"{state.history['seconds']:.1f}s)")


if __name__ == "__main__":
    main()
