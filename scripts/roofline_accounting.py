"""Roofline accounting for the mxu tier: how close is the train step to
the hardware floors? (BASELINE target: "SpMM/SDDMM at speed-of-light".)

Decomposition, measured on the chip at the bench's N=65k MagNet config:

  train step  ~= n_applies x dual-apply time  + head/einsum/adam residue
  dual apply  ~= row-gather floor (E2 rows from the [N, 2F] table)
                 + message-stream bandwidth (the [E2, 2F] gather output
                   written + read once by the scatter kernel)

Prints one line per quantity and the achieved fraction of each floor.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_signed_directed_tpu.data import DSBM
from pytorch_geometric_signed_directed_tpu.graph import in_out_degree
from pytorch_geometric_signed_directed_tpu.nn import (
    MagNet_node_classification)
from pytorch_geometric_signed_directed_tpu.ops.spmm import (
    dual_spmm_stacked, set_matmul_precision, set_message_dtype)
from pytorch_geometric_signed_directed_tpu.spectral import magnet_propagators
from pytorch_geometric_signed_directed_tpu.utils import meta_graph_generation


def timed(fn, *args, steps=30):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    return (time.perf_counter() - t0) / steps


def scan_timed(fn, x0, steps=30):
    """Time fn amortized inside one jitted lax.scan (no per-call dispatch,
    which costs ~ms over the tunneled runtime).  ``fn(x)`` must map a
    [N, F] input to some array; a data dependence through the scan carry
    defeats loop hoisting/CSE of the constant-operand computation."""

    @jax.jit
    def run(x0):
        def body(c, _):
            out = fn(x0 + c.astype(x0.dtype))
            return jnp.float32(1e-20) * out.ravel()[0], None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=steps)[0]

    run(x0).block_until_ready()
    t0 = time.perf_counter()
    run(x0).block_until_ready()
    return (time.perf_counter() - t0) / steps


def main():
    print("backend:", jax.default_backend(), flush=True)
    set_matmul_precision("default")
    set_message_dtype("bf16")
    n, avg_deg, hidden, K, layers = 65_536, 30, 32, 2, 2

    F = meta_graph_generation("cyclic", 3, 0.05, False)
    A, labels = DSBM(n, 3, avg_deg / n * 3, F, rng=np.random.default_rng(0))
    ei = np.vstack(A.nonzero())
    w = A.tocoo().data
    e_in = ei.shape[1]
    x = in_out_degree(ei, n, edge_weight=w)
    x = jnp.asarray(x / max(x.max(), 1.0))
    lap = magnet_propagators(ei, w, q=0.25, num_nodes=n, mode="mxu")
    D = lap.dual
    e2 = D.col.shape[-1] if D.plan is not None else D.col.size
    f2 = 2 * hidden

    # (a) bare row gather: E2 rows from the [N, 2F] bf16 activation table
    idx = jnp.asarray(np.asarray(D.col))
    table = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, f2)), jnp.bfloat16)
    t_gather = scan_timed(lambda t: t[idx], table)

    # (b) one fused dual apply (gather + weighting + scatter kernel)
    xx = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, f2)), jnp.float32)
    t_apply = scan_timed(lambda v: dual_spmm_stacked(D, v), xx)

    # (c) the full train step (fwd+bwd+adam)
    model = MagNet_node_classification(
        num_features=2, hidden=hidden, K=K, label_dim=3, activation=True,
        layer=layers)
    params = model.init(jax.random.PRNGKey(0), x, x, lap)
    y = jnp.asarray(np.random.default_rng(3).integers(0, 3, n))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            logp = model.apply(p, x, x, lap)
            return -jnp.mean(logp[jnp.arange(n), y])

        loss, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt)
        return optax.apply_updates(params, u), opt, loss

    t_step = timed(lambda: step(params, opt), steps=20)

    # floors from the measured v5e constants (PERF.md): sub-cliff gather
    # ~350-410M rows/s; HBM stream ~819 GB/s peak, [E2, 2F] bf16 messages
    # written once by the gather fusion and read once by the kernel, rows
    # padded to 128 lanes on HBM
    msg_bytes = e2 * max(f2, 128) * 2
    n_applies = 2 * layers * K        # fwd K per layer + bwd transpose
    print(f"graph: N={n} E_in={e_in} plan E2={e2} lanes={f2}")
    print(f"bare gather of E2 rows: {t_gather*1e3:.2f} ms "
          f"({e2/t_gather/1e6:.0f}M rows/s)")
    print(f"one dual apply:         {t_apply*1e3:.2f} ms "
          f"(gather share {t_gather/t_apply:.0%}, msgs 2x{msg_bytes/1e6:.0f}"
          f"MB -> {2*msg_bytes/t_apply/1e9:.0f} GB/s apparent)")
    print(f"train step:             {t_step*1e3:.2f} ms "
          f"({e_in/t_step/1e6:.1f}M input-edges/s)")
    print(f"{n_applies} applies account for {n_applies*t_apply/t_step:.0%} "
          f"of the step; gather floor alone is "
          f"{n_applies*t_gather/t_step:.0%}")


if __name__ == "__main__":
    main()
