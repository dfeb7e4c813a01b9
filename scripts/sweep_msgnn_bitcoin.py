"""MSGNN bitcoin 4-class (sign+direction) link sweep.

The reference example's defaults (examples/msgnn_link.py: q=0, K=1,
h=16, dropout 0.5, wd 5e-4, lr 1e-2, 200 epochs, UNWEIGHTED degree
features, 5 splits, final-epoch test acc) differ from our experiment's
round-1 settings (q=0.25, weighted signed features, no dropout) — this
sweep crosses feature variants with q/K/hidden at the reference's
training recipe and reports final-epoch accuracy per the reference.
"""
import argparse
import itertools
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_signed_directed_tpu.data import (
    SignedData, load_signed_real_data)
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import MSGNN_link_prediction
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.utils import link_class_split


def features(g, w, n, kind):
    if kind == "uw2":        # reference default: unweighted, unsigned
        x = in_out_degree(g, n)
    elif kind == "sd4":      # reference --sd_input_feat: pos/neg concat
        d = SignedData(edge_index=np.asarray(g), edge_weight=np.asarray(w))
        d.separate_positive_negative()
        x1 = in_out_degree(np.asarray(d.edge_index_p), n)
        x2 = in_out_degree(np.asarray(d.edge_index_n), n)
        x = np.concatenate([np.asarray(x1), np.asarray(x2)], axis=1)
    else:                    # "w4": weighted signed (round-1 setting)
        x = in_out_degree(g, n, signed=True, edge_weight=w)
    x = np.asarray(x, np.float32)
    return jnp.asarray(x / max(np.abs(x).max(), 1.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="bitcoin_alpha")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--top", type=int, default=12)
    args = ap.parse_args()

    data = load_signed_real_data(args.dataset)
    n = data.num_nodes
    datasets = link_class_split(data, splits=args.runs,
                                task="four_class_signed_digraph",
                                prob_val=0.0, prob_test=0.2, seed=0)

    grid = list(itertools.product(("uw2", "sd4", "w4"), (0.0, 0.1, 0.25),
                                  (1, 2), (16, 64)))
    results = []
    t0 = time.time()
    for ci, (feat, q, K, hidden) in enumerate(grid):
        accs = []
        for s in range(args.runs):
            g, w = datasets[s]["graph"], datasets[s]["weights"]
            x = features(g, w, n, feat)
            lap = magnet_propagators(g, w, q=q, num_nodes=n, signed=True)
            tr_e = jnp.asarray(datasets[s]["train"]["edges"])
            tr_y = jnp.asarray(datasets[s]["train"]["label"])
            te_e = jnp.asarray(datasets[s]["test"]["edges"])
            te_y = np.asarray(datasets[s]["test"]["label"])
            model = MSGNN_link_prediction(
                num_features=int(x.shape[1]), hidden=hidden, K=K, q=q,
                label_dim=4, dropout=0.5)
            params = model.init(jax.random.PRNGKey(s), x, x, lap, tr_e)
            tx = optax.chain(optax.add_decayed_weights(5e-4),
                             optax.adam(1e-2))

            @jax.jit
            def run(params, opt_state, key, x, lap, tr_e, tr_y):
                def body(carry, k):
                    params, opt_state = carry

                    def loss_fn(p):
                        logp, _ = model.apply(p, x, x, lap, tr_e, True,
                                              rngs={"dropout": k})
                        return -jnp.mean(
                            logp[jnp.arange(tr_e.shape[0]), tr_y])

                    loss, grads = jax.value_and_grad(loss_fn)(params)
                    updates, opt_state = tx.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates),
                            opt_state), loss

                keys = jax.random.split(key, args.epochs)
                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), keys)
                return params, losses[-1]

            params, _ = run(params, tx.init(params),
                            jax.random.PRNGKey(100 + s), x, lap, tr_e, tr_y)
            logp, _ = model.apply(params, x, x, lap, te_e)
            accs.append((np.asarray(logp).argmax(1) == te_y).mean())
        rec = dict(f=feat, q=q, K=K, h=hidden,
                   acc=float(np.mean(accs)), std=float(np.std(accs)))
        results.append(rec)
        print(f"[{ci + 1}/{len(grid)} {time.time() - t0:.0f}s] {rec}",
              flush=True)

    results.sort(key=lambda r: -r["acc"])
    print("\n=== top configs ===")
    for r in results[: args.top]:
        print(r)


if __name__ == "__main__":
    main()
