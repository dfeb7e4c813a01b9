"""Benchmark harness: flagship MagNet training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: graph edges processed per second per chip for a full MagNet
(K=2, 2 layers) training step (forward + backward + Adam), full-batch.
The reference publishes no performance numbers (BASELINE.md), so
vs_baseline is throughput relative to this framework's own XLA
segment-sum tier on the same graph — i.e. the speedup the tiered
(dense-MXU) execution buys over the scatter-based baseline the reference's
torch-scatter design corresponds to.
"""
import json
import sys
import time

import numpy as np


def _build(n, avg_deg, mode, seed=0):
    import jax.numpy as jnp
    from pytorch_geometric_signed_directed_tpu.data import DSBM
    from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
    from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
    from pytorch_geometric_signed_directed_tpu.nn import MagNet_node_classification
    from pytorch_geometric_signed_directed_tpu.utils import meta_graph_generation

    F = meta_graph_generation("cyclic", 5, 0.05, False)
    p = avg_deg / n
    A, labels = DSBM(n, 5, p * 5 / 2, F, rng=np.random.default_rng(seed))
    edge_index = np.vstack(A.nonzero())
    e = edge_index.shape[1]
    w = A.tocoo().data
    x = in_out_degree(edge_index, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    lap = magnet_propagators(edge_index, w, q=0.25, num_nodes=n, mode=mode)
    model = MagNet_node_classification(
        num_features=2, hidden=32, K=2, label_dim=5, activation=True, layer=2)
    return model, x, lap, jnp.asarray(labels), e


def _time_train(model, x, lap, y, steps=100):
    """Seconds per full training step, measured with the whole loop inside
    one jit (lax.scan) so per-call dispatch doesn't pollute the number, and
    synchronized by fetching the final scalar loss (block_until_ready is
    not reliable on tunneled backends)."""
    import jax
    import jax.numpy as jnp
    import optax

    params = model.init(jax.random.PRNGKey(0), x, x, lap)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    n = x.shape[0]

    # the graph operators are jit ARGUMENTS, not closure constants — baking
    # a [N, N] dense propagator into the HLO as a constant bloats the
    # program (and overflows remote-compile transports)
    @jax.jit
    def run(params, opt_state, x, lap, y):
        def body(carry, _):
            params, opt_state = carry

            def loss_fn(p):
                logp = model.apply(p, x, x, lap)
                return -jnp.mean(logp[jnp.arange(n), y])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=steps)
        return params, opt_state, losses[-1]

    _, _, loss = run(params, opt_state, x, lap, y)  # compile + warmup
    float(loss)
    t0 = time.perf_counter()
    _, _, loss = run(params, opt_state, x, lap, y)
    float(loss)  # device sync
    return (time.perf_counter() - t0) / steps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    avg_deg = 24
    import jax
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_matmul_precision, set_message_dtype)

    # TPU-conventional training precision (bf16 MXU passes and bf16 message
    # storage, f32 accumulation everywhere): 1.8x over the parity-grade
    # HIGHEST setting used in the allclose tests.
    set_matmul_precision("default")
    set_message_dtype("bf16")
    model, x, lap, y, e = _build(n, avg_deg, mode="auto")
    dt = _time_train(model, x, lap, y)
    edges_per_s = e / dt

    # baseline tier: plain XLA gather+segment-sum (what a line-by-line
    # port of the reference's scatter-based design would do)
    model_b, x_b, lap_b, y_b, e_b = _build(n, avg_deg, mode="segment")
    dt_b = _time_train(model_b, x_b, lap_b, y_b)

    print(json.dumps({
        "metric": "magnet_train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": f"edges/s (N={n}, E={e}, K=2, 2 layers, fwd+bwd+adam, "
                f"backend={jax.default_backend()})",
        "vs_baseline": round(dt_b / dt, 3),
    }))


if __name__ == "__main__":
    main()
