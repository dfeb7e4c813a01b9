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
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from flax import struct

WINDOW = 128  # output rows per window
CHUNK = 1024  # edges per grid step (8 sub-blocks of 128 -> aligned tiles)
SUB = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


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


def build_scatter_plan(row, num_rows: int, chunk: int = CHUNK) -> ScatterPlan:
    """row: sorted destination ids of the valid edges (host numpy)."""
    assert chunk % SUB == 0, f"chunk must be a multiple of {SUB}"
    row = np.asarray(row, np.int64)
    e = len(row)
    order = np.argsort(row, kind="stable")
    row_sorted = row[order]
    win_of_edge = row_sorted // WINDOW
    num_windows = _round_up(max(num_rows, 1), WINDOW) // WINDOW

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
    # [num_chunks * 8, SUB]: each grid step reads an (8, SUB)-aligned tile
    lr_all = np.concatenate(lr_parts).reshape(-1, SUB)
    plan = ScatterPlan(
        local_rows=jnp.asarray(lr_all),
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


def _kernel(win_ref, lr_ref, msgs_ref, out_ref):
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (WINDOW, SUB), 0)
    acc = jnp.zeros((WINDOW, msgs_ref.shape[1]), jnp.float32)
    for a in range(lr_ref.shape[0]):  # chunk // SUB sub-tiles
        onehot = (rows == lr_ref[a][None, :]).astype(jnp.float32)
        # HIGHEST keeps msgs at full f32 through the MXU passes (the
        # one-hot operand is exact in any precision); the kernel is
        # bandwidth-bound so the extra passes are free
        acc += jnp.dot(onehot, msgs_ref[pl.ds(a * SUB, SUB), :],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    out_ref[...] += acc


@functools.partial(jax.jit,
                   static_argnames=("num_windows", "interpret"))
def _scatter_matmul(win, local_rows, msgs, num_windows: int,
                    interpret: bool = False):
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
        _kernel,
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
    f = msgs.shape[1]
    out = _scatter_matmul(plan.win, plan.local_rows,
                          msgs.astype(jnp.float32), plan.num_windows,
                          interpret=jax.default_backend() != "tpu")
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
