"""On-chip A/B: col-blocked two-phase gather vs the flat/streamed gather
on UNIFORM-degree giant graphs (VERDICT r2 item 7 / ROADMAP item 2).

Power-law graphs lift off the ~137M rows/s (bf16) gather floor via the
hot/cold column split; uniform-degree graphs gate it off (top-131k cols
cover < 25% of edges) and stay on the floor.  The candidate fix is a
col-BLOCKED layout: partition columns into blocks of <= GATHER_FAST_ROWS
(the measured gather cliff), gather each block's edges from the x slice
of that block alone (every gather table is then under the cliff -> fast
rate), and accumulate the per-block scatters.

Cost model (ops/pallas/scatter_mxu.py geometry): per (row-window, block)
bin, edges pad to chunk multiples, so the layout pays
  padding_factor ~ 1 + chunk/2 / (E / (num_windows * B))
extra scatter work for a gather-rate win of ~350/137 = 2.55x on the
gather phase.  This script measures both sides at N = 2^20 uniform
degree for a sparse (deg 8) and a denser (deg 48) graph, prints the
model's prediction next to the measurement, and exits 0.

Run: python scripts/ab_colblock_gather.py [--quick]
"""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def sync_time(fn, *args, steps=20):
    r = fn(*args)
    float(np.asarray(jax.block_until_ready(r)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        r = fn(*args)
    float(np.asarray(jax.block_until_ready(r)).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="halve N and skip the dense config")
    ap.add_argument("--feat", type=int, default=64)
    ap.add_argument("--log2n", type=int, default=None,
                    help="override N = 2**log2n (the tunneled backend "
                         "413s past ~10M edges; deg-48 needs 2**19)")
    ap.add_argument("--degs", type=int, nargs="+", default=None)
    args = ap.parse_args()

    from pytorch_geometric_signed_directed_tpu.ops import (
        build_coo, propagator_from_coo)
    from pytorch_geometric_signed_directed_tpu.ops.pallas.scatter_mxu import (
        GATHER_FAST_ROWS)
    from pytorch_geometric_signed_directed_tpu.ops.spmm import (
        set_message_dtype)

    set_message_dtype("bf16")  # bench-conventional training precision

    n = 1 << (args.log2n if args.log2n is not None
              else (19 if args.quick else 20))
    block = GATHER_FAST_ROWS
    nb = (n + block - 1) // block
    degs = tuple(args.degs) if args.degs else ((8,) if args.quick
                                               else (8, 48))
    rng = np.random.default_rng(0)
    f = args.feat
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    print(f"backend={jax.default_backend()}  N={n}  blocks={nb} x {block}"
          f"  F={f}")
    for deg in degs:
        e = n * deg
        row = rng.integers(0, n, e).astype(np.int64)
        col = rng.integers(0, n, e).astype(np.int64)   # uniform degree
        val = np.ones(e, np.float32)

        # --- baseline: one propagator over the full column space
        P = propagator_from_coo(build_coo(row, col, val, n), mode="mxu")
        base = jax.jit(lambda x: P(x))
        t_base = sync_time(base, x)

        # --- col-blocked: per-block rectangular propagators over x slices
        bid = col // block
        parts = []
        for b in range(nb):
            m = bid == b
            A = build_coo(row[m], col[m] - b * block, val[m], n,
                          num_cols=min(block, n - b * block))
            parts.append(propagator_from_coo(A, mode="mxu"))

        def blocked(x):
            out = parts[0](x[:block])
            for b in range(1, nb):
                out = out + parts[b](x[b * block:(b + 1) * block])
            return out

        blk = jax.jit(blocked)
        t_blk = sync_time(blk, x)

        # correctness cross-check (bf16 messages -> loose tol)
        d = float(jnp.max(jnp.abs(base(x) - blk(x))))
        s = float(jnp.max(jnp.abs(base(x)))) + 1e-9

        # cost-model prediction: extra scatter work from per-bin padding
        tiers = [getattr(p.mxu, "plan", None) for p in parts]
        pad_edges = sum(int(p.mxu.col.size) for p in parts)
        base_edges = (int(P.mxu.col.size) if P.mxu.stream is None
                      else int(P.mxu.col.size))
        print(f"deg={deg:3d} E={e/1e6:.1f}M | baseline "
              f"{'streamed' if P.mxu.stream is not None else 'flat':8s} "
              f"{t_base*1e3:8.2f} ms ({e/t_base/1e6:7.1f}M edges/s) | "
              f"col-blocked {t_blk*1e3:8.2f} ms ({e/t_blk/1e6:7.1f}M e/s) "
              f"| speedup {t_base/t_blk:5.2f}x | padded/real edges "
              f"{pad_edges/e:.2f} (baseline {base_edges/e:.2f}) | "
              f"rel err {d/s:.1e}")
        assert d / s < 2e-2, "col-blocked result mismatch"


if __name__ == "__main__":
    main()
