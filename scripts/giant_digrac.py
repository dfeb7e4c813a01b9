"""DIGRAC self-supervised clustering at WikiTalk scale on ONE chip.

Capability demo unblocked by the sparse-pair imbalance path
(experiments/digrac.py no longer densifies A): the full DIGRAC
objective — DIMPA trunk + probabilistic imbalance loss (reference
utils/directed/prob_imbalance_loss.py:104-117) — trains full-batch on a
N=2.4M / E=10M power-law digraph, with the adjacency volumes A·P and
A^T·P riding the same streamed mxu Propagator tier as the trunk.

Prints per-phase timings, the loss trajectory (must decrease), and one
JSON summary line.  Run on the real TPU: ``python scripts/giant_digrac.py``.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_giant import powerlaw_digraph  # noqa: E402


def main(n=2_400_000, e=10_000_000, k=5, hop=2, hidden=32, steps=30,
         lr=1e-2, seed=0, fused=False):
    import jax
    import jax.numpy as jnp
    import optax
    from pytorch_geometric_signed_directed_tpu.graph import (
        adj_dual_propagator, in_out_degree, norm_propagator,
        rw_norm_dual_propagator, rw_norm_propagator)
    from pytorch_geometric_signed_directed_tpu.nn import (
        DIGRAC_node_clustering)
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_matmul_precision, set_message_dtype)
    from pytorch_geometric_signed_directed_tpu.utils import (
        Prob_Imbalance_Loss)

    # TPU-conventional training precision, same as bench.py: bf16 MXU
    # passes + bf16 message storage with f32 accumulation.  The
    # parity-grade HIGHEST default costs ~6x on the scatter-as-matmul
    # kernels (every pass becomes the multi-pass f32 emulation).
    set_matmul_precision("default")
    set_message_dtype("bf16")

    t0 = time.perf_counter()
    row, col = powerlaw_digraph(n, e, alpha=1.0, seed=seed)
    ei = np.vstack([row, col])
    w = np.ones(len(row), np.float32)
    print(f"graph: N={n} E={len(row)} ({time.perf_counter() - t0:.1f}s)",
          flush=True)

    t0 = time.perf_counter()
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    if fused:
        # union-edge-set duals: the DIMPA trunk's two walk operators and
        # the imbalance volumes' A/A^T each become ONE operator — half
        # the gather+scatter passes per step (the SGCN fusion, taken
        # over direction; negative at N=65k bench scale, A/B'd here)
        P_s = rw_norm_dual_propagator(ei, w, n)
        P_t = None
        A_arg = adj_dual_propagator(ei, w, n)
    else:
        P_s = rw_norm_propagator(ei, w, n)
        P_t = rw_norm_propagator(ei[[1, 0]], w, n)
        A_arg = (norm_propagator(ei[[1, 0]], w, n),
                 norm_propagator(ei, w, n))
    print(f"propagators built ({time.perf_counter() - t0:.1f}s)", flush=True)

    imb = Prob_Imbalance_Loss(k)
    model = DIGRAC_node_clustering(num_features=int(x.shape[1]),
                                   hidden=hidden, nclass=k,
                                   fill_value=0.5, hop=hop)
    params = model.init(jax.random.PRNGKey(seed), P_s, P_t, x)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, aux):
        # every propagator rides as a jit ARGUMENT — closing over the
        # 10M-edge scatter plans bakes them into the HLO as constants
        # (bloats the program past compile-transport limits)
        P_s, P_t, A_arg, x = aux

        def loss_fn(pp):
            _, _, _, prob = model.apply(pp, P_s, P_t, x)
            return imb(prob, A_arg, k, "vol_sum", "sort")

        loss, grads = jax.value_and_grad(loss_fn)(p)
        u, s = tx.update(grads, s)
        return optax.apply_updates(p, u), s, loss

    aux = (P_s, P_t, A_arg, x)
    t0 = time.perf_counter()
    params, opt_state, l0 = step(params, opt_state, aux)
    l0 = float(l0)
    print(f"compile+step0 ({time.perf_counter() - t0:.1f}s) "
          f"loss={l0:.4f}", flush=True)

    losses = [l0]
    t0 = time.perf_counter()
    for i in range(steps - 1):
        params, opt_state, loss = step(params, opt_state, aux)
        losses.append(float(loss))
    dt = (time.perf_counter() - t0) / (steps - 1)
    print("loss trajectory:",
          " ".join(f"{v:.4f}" for v in losses[:: max(1, steps // 10)]),
          flush=True)
    print(json.dumps({
        "metric": "digrac_giant_imbalance_step_s",
        "fused": fused,
        "n": n, "e": len(row), "k": k, "hop": hop,
        "step_seconds": round(dt, 4),
        "input_edges_per_s": round(len(row) / dt, 1),
        "loss_first": round(losses[0], 4),
        "loss_last": round(losses[-1], 4),
        "decreased": losses[-1] < losses[0],
        "backend": jax.default_backend(),
    }), flush=True)
    return 0 if losses[-1] < losses[0] else 1


if __name__ == "__main__":
    fused = "--fused" in sys.argv
    both = "--ab" in sys.argv
    if both:
        rc = main(fused=False)
        rc |= main(fused=True)
        sys.exit(rc)
    sys.exit(main(fused=fused))
