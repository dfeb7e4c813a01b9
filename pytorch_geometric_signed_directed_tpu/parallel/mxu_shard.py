"""Multi-chip execution of the MXU scatter tier (owner-computes shard_map).

The flagship sparse kernel (ops/pallas/scatter_mxu) converts the sorted
segment-sum into one-hot MXU matmuls over a host-built plan.  This module
partitions that plan across a mesh axis so the SAME kernel runs per chip:

  * Host-side, edges are split by destination-row owner (device d owns
    rows [d*rows_per, (d+1)*rows_per), exactly parallel.edge_spmm's
    partition) and a scatter plan is built per device over LOCAL rows with
    one common (window, chunk) geometry; plans are padded to the fleet max
    chunk count and stacked on a leading device axis.
  * Inside shard_map, each device gathers its source features from the
    replicated activation matrix and runs the Pallas scatter kernel on its
    own plan — aggregation needs no communication; the one collective per
    apply is the tiled all-gather that re-replicates the row-sharded
    output over ICI.
  * Backward is the forward of the transposed partitioned operator
    (custom VJP), same as the single-chip tier — so fwd+bwd cost two
    local kernel runs + two all-gathers per apply.

No reference counterpart (the reference is single-device, SURVEY.md §2.7);
this is the driver-defined scaling target (BASELINE.md: ≥80% efficiency).
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from flax import struct

from ..ops.pallas.scatter_mxu import (
    SUB,
    _build_plan_host,
    _pick_geometry,
    _scatter_matmul,
    permute_edge_data,
)


@struct.dataclass
class ShardedMXU:
    """Per-device scatter plans stacked on a leading device axis.

    ``val_b`` is set for the fused dual variant (two same-structure
    operators applied to a lane-stacked input, see ops.spmm.DualPropagator);
    None for the single-operator variant.
    """

    win: jnp.ndarray          # [D, C] LOCAL window ids, non-decreasing
    local_rows: jnp.ndarray   # [D, C * chunk/SUB, SUB] int32
    visited: jnp.ndarray      # [D, num_windows] bool
    col: jnp.ndarray          # [D, E2] int32 global source ids (0 padding)
    val: jnp.ndarray          # [D, E2] float32 (0 padding)
    val_b: Optional[jnp.ndarray]
    num_rows: int = struct.field(pytree_node=False)
    num_cols: int = struct.field(pytree_node=False)
    rows_per_device: int = struct.field(pytree_node=False)
    num_windows: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    n_devices: int = struct.field(pytree_node=False)
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)
    transposed: object = None  # Optional[ShardedMXU]


def build_sharded_mxu(row, col, val, num_rows: int, num_cols: int,
                      mesh: Mesh, axis: str = "graph",
                      val_b=None, with_transpose: bool = True) -> ShardedMXU:
    """Host-side builder from valid COO arrays (numpy)."""
    n_dev = mesh.shape[axis]
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    val_b = None if val_b is None else np.asarray(val_b, np.float32)

    t = None
    if with_transpose:
        t = build_sharded_mxu(col, row, val, num_cols, num_rows, mesh, axis,
                              val_b=val_b, with_transpose=False)

    rows_per = -(-max(num_rows, 1) // n_dev)
    owner = row // rows_per if len(row) else row
    local = row - owner * rows_per
    # one geometry for every device so the stacked plans share one kernel
    window, chunk = _pick_geometry(np.sort(local), rows_per)
    sub = chunk // SUB

    hs, perms = [], []
    for d in range(n_dev):
        m = owner == d
        h = _build_plan_host(local[m], rows_per, chunk=chunk, window=window)
        hs.append(h)
        # perm indexes the DEVICE-LOCAL edge list; lift to global edge ids
        gidx = np.flatnonzero(m)
        p = h["perm"].copy()
        valid = p >= 0
        p[valid] = gidx[p[valid]]
        perms.append(p)

    num_windows = hs[0]["num_windows"]
    c_max = max(len(h["win"]) for h in hs)
    e2 = c_max * chunk

    win_s = np.zeros((n_dev, c_max), np.int32)
    lr_s = np.full((n_dev, c_max * sub, SUB), window, np.int32)
    vis_s = np.zeros((n_dev, num_windows), bool)
    col_s = np.zeros((n_dev, e2), np.int32)
    val_s = np.zeros((n_dev, e2), np.float32)
    vb_s = np.zeros((n_dev, e2), np.float32) if val_b is not None else None
    for d, (h, p) in enumerate(zip(hs, perms)):
        c = len(h["win"])
        win_s[d, :c] = h["win"]
        win_s[d, c:] = h["win"][-1]   # dummy chunks revisit the last window
        lr_s[d, : c * sub] = h["lr"].reshape(-1, SUB)
        vis_s[d] = h["visited"]
        pad = np.full(e2, -1, np.int64)
        pad[: len(p)] = p
        if val_b is None:
            cp, vp = permute_edge_data(pad, col.astype(np.int32), val)
            col_s[d], val_s[d] = cp, vp
        else:
            cp, vp, vbp = permute_edge_data(pad, col.astype(np.int32),
                                            val, val_b)
            col_s[d], val_s[d], vb_s[d] = cp, vp, vbp

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    return ShardedMXU(
        win=put(win_s, P(axis, None)),
        local_rows=put(lr_s, P(axis, None, None)),
        visited=put(vis_s, P(axis, None)),
        col=put(col_s, P(axis, None)),
        val=put(val_s, P(axis, None)),
        val_b=None if vb_s is None else put(vb_s, P(axis, None)),
        num_rows=num_rows, num_cols=num_cols, rows_per_device=rows_per,
        num_windows=num_windows, window=window, n_devices=n_dev,
        mesh=mesh, axis=axis, transposed=t,
    )


def _local_apply(S: ShardedMXU, x, make_msgs):
    """shard_map body factory: local gather + Pallas scatter + all-gather."""
    axis, window = S.axis, S.window
    rows_per, nw = S.rows_per_device, S.num_windows
    interpret = jax.default_backend() != "tpu"
    from ..ops.spmm import get_matmul_precision

    prec = get_matmul_precision()
    has_b = S.val_b is not None
    in_specs = (P(axis, None), P(axis, None, None), P(axis, None),
                P(axis, None), P(axis, None))
    if has_b:
        in_specs = in_specs + (P(axis, None),)
    in_specs = in_specs + (P(None, None),)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the vma checker can't see through it
    @functools.partial(shard_map, mesh=S.mesh, in_specs=in_specs,
                       out_specs=P(None, None), check_vma=False)
    def run(*args):
        if has_b:
            win, lr, visited, col, val, vb, xx = args
            vb = vb[0]
        else:
            win, lr, visited, col, val, xx = args
            vb = None
        win, lr, visited = win[0], lr[0], visited[0]
        col, val = col[0], val[0]
        msgs = make_msgs(xx[col], val, vb)
        out = _scatter_matmul(win, lr, msgs, nw, window=window,
                              interpret=interpret, precision=prec)
        mask = jnp.repeat(visited, window)[:rows_per]
        out = jnp.where(mask[:, None], out[:rows_per], 0.0)
        return jax.lax.all_gather(out, axis, axis=0, tiled=True)

    args = (S.win, S.local_rows, S.visited, S.col, S.val)
    if has_b:
        args = args + (S.val_b,)
    out = run(*args, x)
    return out[: S.num_rows]


def _forward(S: ShardedMXU, x):
    from ..ops.spmm import get_message_dtype

    mdt = get_message_dtype() or x.dtype
    if S.val_b is None:
        def make_msgs(g, val, _):
            return (val[:, None] * g).astype(mdt)
    else:
        fa = x.shape[1] // 2
        lane = jnp.arange(x.shape[1]) < fa

        def make_msgs(g, val, vb):
            return (g * jnp.where(lane[None, :], val[:, None],
                                  vb[:, None])).astype(mdt)
    return _local_apply(S, x, make_msgs).astype(x.dtype)


@jax.custom_vjp
def sharded_mxu_spmm(S: ShardedMXU, x: jnp.ndarray) -> jnp.ndarray:
    """A @ x (or the lane-stacked dual [A x_a | B x_b]) across the mesh.

    x is the replicated [num_cols, F] activation; returns the replicated
    [num_rows, F] result.  Differentiable via the transposed operator.
    """
    return _forward(S, x)


def _fwd(S, x):
    return _forward(S, x), S


def _bwd(S, g):
    if S.transposed is None:
        raise ValueError("build_sharded_mxu(with_transpose=False) is not "
                         "differentiable")
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), S)
    return zero, _forward(S.transposed, g)


sharded_mxu_spmm.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Host-side extraction of valid COO triples from built single-chip operators
# (lets shard_propagator/shard_dual re-partition without keeping raw edges).

def _coo_from_mxu(m) -> tuple:
    """(row, col, val) numpy triples of the valid edges of an MXUCoo."""
    if m.plan is not None:
        gr = np.asarray(m.plan.global_rows)
        valid = gr < m.plan.num_rows
        return (gr[valid],
                np.asarray(m.col)[valid], np.asarray(m.val)[valid])
    st = m.stream
    window = st.window
    # per-chunk window ids -> per-edge rows; local_rows==window marks padding
    lr = np.asarray(st.local_rows).reshape(st.win.shape[0], -1)  # [S, E_blk]
    win = np.repeat(np.asarray(st.win),
                    lr.shape[1] // st.win.shape[1], axis=1)
    valid = lr < window
    rows = (win * window + lr)[valid]
    return (rows, np.asarray(m.col)[valid], np.asarray(m.val)[valid])


def _coo_from_dual(d) -> tuple:
    """(row, col, val_a, val_b) of the valid edges of an mxu DualPropagator."""
    if d.plan is not None:
        gr = np.asarray(d.plan.global_rows)
        valid = gr < d.plan.num_rows
        return (gr[valid], np.asarray(d.col)[valid],
                np.asarray(d.val_a)[valid], np.asarray(d.val_b)[valid])
    st = d.stream
    window = st.window
    lr = np.asarray(st.local_rows).reshape(st.win.shape[0], -1)
    win = np.repeat(np.asarray(st.win),
                    lr.shape[1] // st.win.shape[1], axis=1)
    valid = lr < window
    rows = (win * window + lr)[valid]
    return (rows, np.asarray(d.col)[valid],
            np.asarray(d.val_a)[valid], np.asarray(d.val_b)[valid])
