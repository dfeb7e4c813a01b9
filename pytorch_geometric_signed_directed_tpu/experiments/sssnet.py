"""SSSNET semi-supervised signed clustering on (polarized) SSBM.

Equivalent of reference examples/sssnet.py / docs case_study: SSBM ->
extract_network -> spectral features -> node split -> SIMPA trunk ->
50*(NLL + 0.1*triplet) + balanced-cut loss -> ARI.
"""
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from pytorch_geometric_signed_directed_tpu.data import SSBM, SignedData
from pytorch_geometric_signed_directed_tpu.graph import rw_norm_propagator
from pytorch_geometric_signed_directed_tpu.nn import SSSNET_node_clustering
from pytorch_geometric_signed_directed_tpu.train import Trainer
from pytorch_geometric_signed_directed_tpu.utils import (
    Prob_Balanced_Normalized_Loss,
    Unhappy_Ratio,
    extract_network,
)
from pytorch_geometric_signed_directed_tpu.utils.general.triplet_loss import (
    sample_triplets, triplet_loss_inner_product)


def main(argv=None):
    ap = argparse.ArgumentParser()
    # --dataset ssbm reproduces the reference example (synthetic SSBM,
    # examples/sssnet.py); real names dispatch through
    # load_signed_real_data (sampson/rainfall/ppi/... are bundled)
    ap.add_argument("--dataset", default="ssbm")
    ap.add_argument("--N", type=int, default=500)
    ap.add_argument("--K", type=int, default=3)
    ap.add_argument("--p", type=float, default=0.1)
    ap.add_argument("--eta", type=float, default=0.1)
    ap.add_argument("--hop", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--seed_ratio", type=float, default=0.1)
    args = ap.parse_args(argv)

    if args.dataset == "ssbm":
        (A_p, A_n), labels = SSBM(args.N, args.K, args.p, args.eta,
                                  size_ratio=1.5,
                                  rng=np.random.default_rng(args.seed))
        A, labels = extract_network((A_p - A_n).tocsr(), labels)
        data = SignedData(A=A, y=labels)
    else:
        from pytorch_geometric_signed_directed_tpu.data import (
            load_signed_real_data)

        data = load_signed_real_data(args.dataset)
        if data.y is None:
            raise SystemExit(f"{args.dataset} carries no labels; the "
                             "clustering ARI protocol needs them")
        args.K = int(np.asarray(data.y).max()) + 1
    data.set_spectral_adjacency_reg_features(k=args.K)
    data.node_split(train_size_per_class=0.8, val_size_per_class=0.1,
                    seed_size_per_class=args.seed_ratio, data_split=2)
    data.separate_positive_negative()
    n = data.num_nodes
    x = jnp.asarray(np.asarray(data.x, np.float32))
    P_p = rw_norm_propagator(data.edge_index_p, data.edge_weight_p, n, 0.5)
    P_n = rw_norm_propagator(data.edge_index_n, data.edge_weight_n, n, 0.0)
    y = jnp.asarray(data.y)

    from sklearn.metrics import adjusted_rand_score

    aris = []
    for split in range(data.train_mask.shape[1]):
        train_idx = jnp.asarray(np.nonzero(data.train_mask[:, split])[0])
        test_idx = np.nonzero(data.test_mask[:, split])[0]
        pbnc = Prob_Balanced_Normalized_Loss(data.A_p.tocsr(),
                                             data.A_n.tocsr())
        model = SSSNET_node_clustering(nfeat=x.shape[1], hidden=args.hidden,
                                       nclass=args.K, hop=args.hop)
        params = model.init(jax.random.PRNGKey(args.seed), P_p, P_n, x)
        rng = np.random.default_rng(args.seed)

        def batch_fn():
            # operators + loss ride as jit ARGUMENTS (pytrees), not
            # closure constants: at wikirfa scale the dense tier is
            # 233MB per operator and constants overflow the
            # remote-compile transport
            return (sample_triplets(np.asarray(data.y), n, 200, rng),
                    P_p, P_n, pbnc)

        def loss_fn(p, triplets, Pp, Pn, bal):
            z, logp, _, prob = model.apply(p, Pp, Pn, x)
            nll = -jnp.mean(logp[train_idx, y[train_idx]])
            tl = triplet_loss_inner_product(z, *triplets)
            return 50.0 * (nll + 0.1 * tl) + bal(prob)

        trainer = Trainer(loss_fn, lr=args.lr)
        state = trainer.fit(trainer.init(params), batch_fn, args.epochs)
        _, _, pred, prob = model.apply(state.params, P_p, P_n, x)
        ari = adjusted_rand_score(np.asarray(data.y)[test_idx],
                                  np.asarray(pred)[test_idx])
        unhappy = float(Unhappy_Ratio(data.A_p.tocsr(),
                                      data.A_n.tocsr())(prob))
        aris.append(ari)
        print(f"split {split}: test ARI {ari:.4f} unhappy {unhappy:.4f}")
    print(f"mean ARI: {np.mean(aris):.4f} +/- {np.std(aris):.4f}")


if __name__ == "__main__":
    main()
