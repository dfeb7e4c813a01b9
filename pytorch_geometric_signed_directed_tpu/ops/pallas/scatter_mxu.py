"""Sorted segment-sum as MXU matmuls (scatter-free aggregation).

XLA's sorted segment-sum on TPU serializes row updates (~99M rows/s at
F=32); this kernel converts the scatter into dense matmuls: edges are
host-partitioned into chunks that never cross a 128-row output window,
and each chunk contributes

    out[window] += one_hot(local_row)[128, C] @ msgs[C, F]

with the one-hot built on the fly from an iota compare (VPU) and the
product on the MXU.  Consecutive chunks of the same window accumulate in
VMEM (same revisiting pattern as the BSR kernel).  FLOPs are 128x the
edge count — cheap against MXU throughput — and the memory traffic is one
linear read of msgs, so the kernel runs at the bandwidth roofline instead
of the scatter floor.

Backward of segment-sum is a gather (d_msgs[e] = g[row[e]]), which XLA
does well; wired up via custom_vjp.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import struct

WINDOW = 128  # output rows per window
CHUNK = 1024  # fallback edges per grid step (see _pick_chunk)
SUB = 128

# Measured pipeline constants on TPU v5e (scratch micro-bench, E=2M/F=32):
# each grid step costs ~1.35us of fixed overhead regardless of block bytes,
# and every padded edge rides the expensive XLA row-gather (~2.4ns/edge).
# _pick_chunk trades the two: big chunks amortize step overhead, small
# chunks avoid padding low-degree windows up to the chunk size.
_STEP_OVERHEAD_NS = 1350.0
_GATHER_NS_PER_EDGE = 2.4


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_chunk(window_counts: np.ndarray) -> int:
    """Choose the per-grid-step edge count minimizing step overhead +
    padded-gather cost for this degree profile."""
    best, best_cost = CHUNK, float("inf")
    for chunk in (1024, 2048, 4096, 8192):
        padded = np.sum(
            (window_counts + chunk - 1) // chunk).astype(np.int64) * chunk
        steps = padded // chunk
        cost = steps * _STEP_OVERHEAD_NS + padded * _GATHER_NS_PER_EDGE
        if cost < best_cost:
            best, best_cost = chunk, cost
    return best


@struct.dataclass
class ScatterPlan:
    """Host-built edge layout: chunks never cross a 128-row window.

    perm maps plan order -> original edge order (host numpy, not a leaf).
    local_rows holds row % 128 (WINDOW marks padding); global_rows holds
    the full row id (num_rows marks padding) for the backward gather.
    """

    local_rows: jnp.ndarray   # [num_chunks * (chunk/SUB), SUB] int32
    global_rows: jnp.ndarray  # [E2] int32 in [0, num_rows]
    win: jnp.ndarray          # [num_chunks] int32, non-decreasing
    visited: jnp.ndarray      # [num_windows] bool; empty windows get no
                              # chunks and are zeroed by an output mask
    num_rows: int = struct.field(pytree_node=False)
    num_windows: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)   # valid (unpadded)


def build_scatter_plan(row, num_rows: int,
                       chunk: Optional[int] = None) -> ScatterPlan:
    """row: sorted destination ids of the valid edges (host numpy)."""
    row = np.asarray(row, np.int64)
    e = len(row)
    order = np.argsort(row, kind="stable")
    row_sorted = row[order]
    win_of_edge = row_sorted // WINDOW
    num_windows = _round_up(max(num_rows, 1), WINDOW) // WINDOW
    if chunk is None:
        counts = np.bincount(win_of_edge, minlength=num_windows)
        chunk = _pick_chunk(counts[counts > 0])
    assert chunk % SUB == 0, f"chunk must be a multiple of {SUB}"

    perm_parts, lr_parts, gr_parts, win_ids = [], [], [], []
    visited = np.zeros(num_windows, bool)
    start = 0
    for w in range(num_windows):
        end = start + int(np.searchsorted(win_of_edge[start:], w + 1))
        cnt = end - start
        if cnt == 0:
            continue  # no chunk; the output mask zeroes this window
        visited[w] = True
        padded = _round_up(cnt, chunk)
        idx = order[start:end]
        lr = np.full(padded, WINDOW, np.int32)
        gr = np.full(padded, num_rows, np.int32)
        lr[:cnt] = (row_sorted[start:end] % WINDOW).astype(np.int32)
        gr[:cnt] = row_sorted[start:end].astype(np.int32)
        perm_parts.append(np.concatenate(
            [idx, np.full(padded - cnt, -1, np.int64)]))
        lr_parts.append(lr)
        gr_parts.append(gr)
        win_ids.extend([w] * (padded // chunk))
        start = end
    if not lr_parts:  # completely empty graph: one dummy padding chunk
        visited[0] = False
        perm_parts.append(np.full(chunk, -1, np.int64))
        lr_parts.append(np.full(chunk, WINDOW, np.int32))
        gr_parts.append(np.full(chunk, num_rows, np.int32))
        win_ids.append(0)

    perm = np.concatenate(perm_parts)
    # [num_chunks * (chunk/SUB), SUB]: each grid step reads an aligned tile
    lr_flat = np.concatenate(lr_parts)
    plan = ScatterPlan(
        local_rows=jnp.asarray(lr_flat.reshape(-1, SUB)),
        global_rows=jnp.asarray(np.concatenate(gr_parts)),
        win=jnp.asarray(np.asarray(win_ids, np.int32)),
        visited=jnp.asarray(visited),
        num_rows=num_rows, num_windows=num_windows, num_edges=e,
    )
    return plan, perm


def permute_edge_data(perm: np.ndarray, *arrays) -> Tuple[np.ndarray, ...]:
    """Reorder per-edge host arrays into plan order (padding -> 0)."""
    out = []
    for a in arrays:
        a = np.asarray(a)
        padded = np.zeros((len(perm),) + a.shape[1:], a.dtype)
        valid = perm >= 0
        padded[valid] = a[perm[valid]]
        out.append(padded)
    return tuple(out)


def _kernel(win_ref, lr_ref, msgs_ref, out_ref, *, precision):
    """One grid step: accumulate a chunk of plan-ordered messages into the
    current 128-row output window.

    One wide one-hot [WINDOW, chunk] and a single MXU dot per grid step —
    K-dim streaming amortizes the MXU issue latency that dominated the
    per-sub-tile variant.  The one-hot operand is exact in any precision;
    `precision` only controls the MXU passes over the msgs operand.

    Feature widths < 128 lanes pay a DMA penalty on the msgs blocks
    (~90 GB/s vs ~170 GB/s full-lane measured on v5e) — but repacking
    msgs into 128-lane rows costs a relayout (~2.5 ms at E=2M, TPU HBM
    tiles pad narrow rows) that exceeds the saving.  The fast path for
    narrow features is stacking streams up to 128 lanes *before* the
    gather (see ops.spmm multi-stream helpers): the XLA row gather is
    row-count-bound up to 128 lanes, so stacked streams ride for free.
    """
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, SUB), 0)
    onehot = jnp.concatenate(
        [(rows == lr_ref[a][None, :]).astype(msgs_ref.dtype)
         for a in range(lr_ref.shape[0])], axis=1)    # [WINDOW, chunk]
    out_ref[...] += jnp.dot(onehot, msgs_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("num_windows", "interpret", "precision"))
def _scatter_matmul(win, local_rows, msgs, num_windows: int,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST):
    num_chunks = win.shape[0]
    f = msgs.shape[1]
    # chunk geometry derived from the arrays themselves so a plan built
    # with a non-default chunk size stays consistent with the block specs
    sub_per_chunk = local_rows.shape[0] // num_chunks
    chunk = sub_per_chunk * SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((chunk, f), lambda i, win: (i, 0)),
        ],
        out_specs=pl.BlockSpec((WINDOW, f), lambda i, win: (win[i], 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * WINDOW, f),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * chunk * WINDOW * f,
            bytes_accessed=msgs.size * 4 + num_windows * WINDOW * f * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win, local_rows, msgs)


@jax.custom_vjp
def scatter_sum(plan: ScatterPlan, msgs: jnp.ndarray) -> jnp.ndarray:
    """Segment-sum of plan-ordered msgs [E2, F] -> [num_rows, F]."""
    return _scatter_forward(plan, msgs)


def _scatter_forward(plan, msgs):
    # no feature padding: Mosaic allows a full-width last dim, and padding
    # to 128 lanes would multiply the HBM traffic of the bandwidth-bound
    # msgs stream
    from ..spmm import get_matmul_precision

    f = msgs.shape[1]
    out = _scatter_matmul(plan.win, plan.local_rows,
                          msgs.astype(jnp.float32), plan.num_windows,
                          interpret=jax.default_backend() != "tpu",
                          precision=get_matmul_precision())
    # zero the windows no chunk wrote (their buffers are uninitialized)
    mask = jnp.repeat(plan.visited, WINDOW)[: plan.num_rows]
    return jnp.where(mask[:, None], out[: plan.num_rows, :f], 0.0)


def _fwd(plan, msgs):
    return _scatter_forward(plan, msgs), plan


def _bwd(plan, g):
    # d msgs[e] = g[global_row[e]] (padding rows index num_rows -> zero)
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), plan)
    return zero, g_pad[plan.global_rows]


scatter_sum.defvjp(_fwd, _bwd)


@struct.dataclass
class MXUCoo:
    """COO in plan order + the scatter plan: A @ x via XLA gather + MXU
    scatter.  ``transposed`` (same structure for A^T) makes the backward a
    forward pass of the transpose instead of an unsorted XLA scatter."""

    plan: ScatterPlan
    col: jnp.ndarray   # [E2] int32 (0 for padding)
    val: jnp.ndarray   # [E2] float (0 for padding)
    num_cols: int = struct.field(pytree_node=False)
    transposed: object = None  # Optional[MXUCoo]


def mxu_from_coo(A, with_transpose: bool = True) -> MXUCoo:
    """Build from ops.coo.COO (valid entries only)."""
    row = np.asarray(A.row)[: A.nnz]
    col = np.asarray(A.col)[: A.nnz]
    val = np.asarray(A.val)[: A.nnz]

    def build(r, c, n_rows, n_cols, t):
        plan, perm = build_scatter_plan(r, n_rows)
        c_p, v_p = permute_edge_data(perm, np.asarray(c, np.int32),
                                     val.astype(np.float32))
        return MXUCoo(plan=plan, col=jnp.asarray(c_p), val=jnp.asarray(v_p),
                      num_cols=n_cols, transposed=t)

    t = build(col, row, A.num_cols, A.num_nodes, None)         if with_transpose else None
    return build(row, col, A.num_nodes, A.num_cols, t)


@jax.custom_vjp
def mxu_spmm(A: MXUCoo, x: jnp.ndarray) -> jnp.ndarray:
    return _mxu_forward(A, x)


def _mxu_forward(A, x):
    msgs = A.val[:, None] * x[A.col]
    return scatter_sum(A.plan, msgs).astype(x.dtype)


def _mxu_fwd(A, x):
    return _mxu_forward(A, x), A


def _mxu_bwd(A, g):
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), A)
    if A.transposed is None:
        raise ValueError("mxu_from_coo(with_transpose=False) is not "
                         "differentiable")
    return zero, _mxu_forward(A.transposed, g)


mxu_spmm.defvjp(_mxu_fwd, _mxu_bwd)
