"""Giant-graph (WikiTalk-scale) MagNet training benchmark on one chip.

Synthetic power-law digraph at the reference's largest dataset scale
(WikiTalk: N=2,388,953 — docs/source/notes/datasets.rst:18; real WikiTalk
in/out degrees are heavy-tailed).  Node ids are randomly permuted so the
hot-column split must find the hubs by degree, not by position.

Measures the full MagNet train step (fwd+bwd+Adam, K=2, 2 layers,
bf16 messages) on the streamed mxu tier, with and without the hot/cold
column-split gather (ops.pallas.scatter_mxu.col_degree_split), and
prints one JSON line per config.
"""
import argparse
import json
import time

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def powerlaw_digraph(n, e, alpha, seed):
    rng = np.random.default_rng(seed)
    w = (np.arange(1, n + 1, dtype=np.float64)) ** -alpha
    cdf = np.cumsum(w)
    cdf /= cdf[-1]

    def zipf_ids(k):
        return np.searchsorted(cdf, rng.random(k)).astype(np.int64)

    row, col = zipf_ids(e), zipf_ids(e)
    keep = row != col
    row, col = row[keep], col[keep]
    # random node relabeling: hubs land at arbitrary ids
    relabel = rng.permutation(n)
    return relabel[row], relabel[col]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_400_000)
    ap.add_argument("--edges", type=int, default=10_000_000)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--no-baseline", action="store_true",
                    help="skip the unsplit-gather comparison run")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.nn import (
        MagNet_node_classification)
    from pytorch_geometric_signed_directed_tpu.ops.pallas import scatter_mxu
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_matmul_precision, set_message_dtype)
    from pytorch_geometric_signed_directed_tpu.spectral import (
        magnet_propagators)

    set_matmul_precision("default")
    set_message_dtype("bf16")

    n, e = args.nodes, args.edges
    t0 = time.time()
    row, col = powerlaw_digraph(n, e, args.alpha, seed=0)
    ei = np.vstack([row, col])
    w = np.ones(len(row), np.float32)
    print(f"# graph: N={n} E={len(row)} ({time.time() - t0:.0f}s)",
          flush=True)

    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    y = jnp.asarray(np.random.default_rng(1).integers(0, 5, n))
    model = MagNet_node_classification(
        num_features=2, hidden=args.hidden, K=2, label_dim=5,
        activation=True, layer=2)

    def build_and_time(tag, split: bool):
        saved = scatter_mxu.COL_SPLIT_MIN_COLS
        if not split:
            scatter_mxu.COL_SPLIT_MIN_COLS = 1 << 60
        try:
            t0 = time.time()
            lap = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="mxu")
            prep = time.time() - t0
        finally:
            scatter_mxu.COL_SPLIT_MIN_COLS = saved
        d = lap.dual
        nnz = (d.stream.num_edges if d.stream is not None
               else d.plan.num_edges)
        hot = d.hot_ids is not None
        print(f"# {tag}: nnz={nnz} streamed={d.stream is not None} "
              f"split={hot} prep={prep:.0f}s", flush=True)

        params = model.init(jax.random.PRNGKey(0), x, x, lap)
        tx = optax.adam(1e-2)

        @jax.jit
        def run(params, opt_state, aux):
            x, lap, y = aux

            def body(carry, _):
                params, opt_state = carry

                def loss_fn(p):
                    logp = model.apply(p, x, x, lap)
                    return -jnp.mean(logp[jnp.arange(x.shape[0]), y])

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return (optax.apply_updates(params, updates),
                        opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), None, length=args.steps)
            return losses[-1]

        st = (params, tx.init(params), (x, lap, y))
        out = run(*st)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        out = run(*st)
        float(np.asarray(out).ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        print(json.dumps({
            "metric": f"magnet_giant_{tag}_edges_per_s_per_chip",
            "value": round(len(row) / dt, 1),
            "unit": f"input edges/s (N={n}, E={len(row)}, nnz={nnz}, "
                    f"power-law a={args.alpha}, step_s={round(dt, 4)}, "
                    f"fwd+bwd+adam, backend={jax.default_backend()})",
            # speedup of the col-split config over the unsplit gather on
            # the same graph (known only after both runs; the split run
            # reports 1.0 relative to itself)
            "vs_baseline": 1.0,
        }), flush=True)
        return dt

    dt_split = build_and_time("split", split=True)
    if not args.no_baseline:
        dt_plain = build_and_time("unsplit", split=False)
        print(json.dumps({
            "metric": "magnet_giant_col_split_speedup",
            "value": round(dt_plain / dt_split, 3),
            "unit": "unsplit step time / col-split step time, same graph",
            "vs_baseline": round(dt_plain / dt_split, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
