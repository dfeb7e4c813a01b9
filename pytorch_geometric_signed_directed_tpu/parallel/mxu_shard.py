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
    _scatter_accum,
    _scatter_matmul,
    col_degree_split,
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
    # col-split layouts (see ops.pallas.scatter_mxu.col_degree_split):
    # hot_ids is [D, H] — device d's leading hot chunks gather from ITS
    # compact table x[hot_ids[d]] (per-device column-degree profiles, up
    # to D x the coverage of one shared table); rows of devices whose
    # subset failed the coverage gate are dummies (their hot sections are
    # empty).  0/None = unsplit.
    hot_ids: Optional[jnp.ndarray] = None
    hot_chunks: int = struct.field(pytree_node=False, default=0)


def build_sharded_mxu(row, col, val, num_rows: int, num_cols: int,
                      mesh: Mesh, axis: str = "graph",
                      val_b=None, with_transpose: bool = True,
                      col_split: bool = True) -> ShardedMXU:
    """Host-side builder from valid COO arrays (numpy).

    ``col_split=False`` disables the per-device hot-column tables —
    required for trainable-value layouts (sharded templates), whose
    fused backward kernel runs on unsplit plans.
    """
    n_dev = mesh.shape[axis]
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val = np.asarray(val, np.float32)
    val_b = None if val_b is None else np.asarray(val_b, np.float32)

    t = None
    if with_transpose:
        t = build_sharded_mxu(col, row, val, num_cols, num_rows, mesh, axis,
                              val_b=val_b, with_transpose=False,
                              col_split=col_split)

    rows_per = -(-max(num_rows, 1) // n_dev)
    owner = row // rows_per if len(row) else row
    local = row - owner * rows_per

    # PER-DEVICE col split: each shard's edge subset has its own column
    # degree profile, so a per-device compact hot table covers up to
    # n_dev x more of each device's gathers than one global table would
    # (the gather source is the replicated activation either way, so a
    # device-local x[hot_ids_d] costs the same one cheap gather).
    # Devices whose subset fails the coverage gate run all-cold with a
    # dummy table row — sections still align via hc_max below.
    grp_all, col_g = None, col
    hot_tables = []
    masks = [owner == d for d in range(n_dev)]
    for d in range(n_dev):
        split = (col_degree_split(col[masks[d]], num_cols)
                 if col_split else None)
        if split is None:
            hot_tables.append(None)
            continue
        grp_d, col_d, hot_d = split
        if grp_all is None:
            grp_all = np.ones(len(col), np.int8)   # default: cold
            col_g = col.copy()
        grp_all[masks[d]] = grp_d
        col_g[masks[d]] = col_d
        hot_tables.append(hot_d)
    if any(h is not None for h in hot_tables):
        h_rows = max(len(h) for h in hot_tables if h is not None)
        hot_ids = np.zeros((n_dev, h_rows), np.int32)
        for d, h in enumerate(hot_tables):
            if h is not None:
                hot_ids[d, : len(h)] = h
        col = col_g
    else:
        hot_ids = None

    # one geometry for every device so the stacked plans share one kernel
    o = np.argsort(local, kind="stable")
    window, chunk = _pick_geometry(
        local[o], rows_per, None if grp_all is None else grp_all[o])
    sub = chunk // SUB

    hs, perms = [], []
    for d in range(n_dev):
        m = masks[d]
        h = _build_plan_host(local[m], rows_per, chunk=chunk, window=window,
                             group=None if grp_all is None else grp_all[m])
        hs.append(h)
        # perm indexes the DEVICE-LOCAL edge list; lift to global edge ids
        gidx = np.flatnonzero(m)
        p = h["perm"].copy()
        valid = p >= 0
        p[valid] = gidx[p[valid]]
        perms.append(p)

    num_windows = hs[0]["num_windows"]
    # sectioned stacking: every device's hot chunks sit in [0, hc_max) and
    # cold chunks in [hc_max, c_max) so the shard_map body can slice the
    # sections statically; dummy chunks have all-padding local rows (no
    # writes under the accumulate kernel) and any valid window id
    hc_max = max(h["hot_chunks"] for h in hs)
    cc_max = max(len(h["win"]) - h["hot_chunks"] for h in hs)
    c_max = hc_max + cc_max
    e2 = c_max * chunk

    win_s = np.zeros((n_dev, c_max), np.int32)
    lr_s = np.full((n_dev, c_max * sub, SUB), window, np.int32)
    vis_s = np.zeros((n_dev, num_windows), bool)
    col_s = np.zeros((n_dev, e2), np.int32)
    val_s = np.zeros((n_dev, e2), np.float32)
    vb_s = np.zeros((n_dev, e2), np.float32) if val_b is not None else None
    for d, (h, p) in enumerate(zip(hs, perms)):
        hc = h["hot_chunks"]
        nc = len(h["win"]) - hc
        pad = np.full(e2, -1, np.int64)
        for (src0, cnt, dst0, dst1) in ((0, hc, 0, hc_max),
                                        (hc, nc, hc_max, c_max)):
            if cnt == 0:
                continue   # all-dummy section: win 0 + all-padding rows is
                           # harmless under the accumulate kernel
            win_s[d, dst0:dst0 + cnt] = h["win"][src0:src0 + cnt]
            # trailing dummies revisit the section's last window so the
            # unsplit _scatter_matmul zero-on-first-visit logic holds
            win_s[d, dst0 + cnt:dst1] = h["win"][src0 + cnt - 1]
            lr_s[d, dst0 * sub:(dst0 + cnt) * sub] = (
                h["lr"][src0 * chunk:(src0 + cnt) * chunk].reshape(-1, SUB))
            pad[dst0 * chunk:(dst0 + cnt) * chunk] = (
                p[src0 * chunk:(src0 + cnt) * chunk])
        vis_s[d] = h["visited"]
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
        hot_ids=None if hot_ids is None else put(jnp.asarray(hot_ids),
                                                 P(axis, None)),
        hot_chunks=hc_max,
    )


def _local_apply(S: ShardedMXU, x, make_msgs, gather_dtype=None):
    """shard_map body factory: local gather + Pallas scatter + all-gather.

    Col-split layouts run two aliased accumulate passes into one
    zero-initialized buffer: the leading hot chunks gather from the
    replicated compact table x[hot_ids], the rest from x itself.

    gather_dtype: payload dtype of the result all-gather (the dominant
    collective — a full replicated [rows, F] table per apply).  bf16
    halves the wire bytes in bf16-message training mode; accumulation
    stays f32 either way.
    """
    axis, window = S.axis, S.window
    rows_per, nw = S.rows_per_device, S.num_windows
    hc = S.hot_chunks
    interpret = jax.default_backend() != "tpu"
    from ..ops.pallas.scatter_mxu import _kernel_precision
    from ..ops.spmm import get_matmul_precision

    prec = get_matmul_precision()
    has_b = S.val_b is not None
    split = S.hot_ids is not None
    in_specs = (P(axis, None), P(axis, None, None), P(axis, None),
                P(axis, None), P(axis, None))
    if has_b:
        in_specs = in_specs + (P(axis, None),)
    if split:
        in_specs = in_specs + (P(axis, None),)   # per-device hot tables
    in_specs = in_specs + (P(None, None),)

    # check_vma=False: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, so the vma checker can't see through it
    @functools.partial(shard_map, mesh=S.mesh, in_specs=in_specs,
                       out_specs=P(None, None), check_vma=False)
    def run(*args):
        args = list(args)
        xx = args.pop()
        hot_ids = args.pop()[0] if split else None   # this device's table
        vb = args.pop()[0] if has_b else None
        win, lr, visited, col, val = (a[0] for a in args)
        if not split:
            msgs = make_msgs(xx[col], val, vb)
            out = _scatter_matmul(
                win, lr, msgs, nw, window=window, interpret=interpret,
                precision=_kernel_precision(msgs.dtype, prec))
            mask = jnp.repeat(visited, window)[:rows_per]
            out = jnp.where(mask[:, None], out[:rows_per], 0.0)
            if gather_dtype is not None:
                # barrier keeps XLA from hoisting the consumer's upcast
                # above the collective (which would re-widen the payload)
                out = jax.lax.optimization_barrier(
                    out.astype(gather_dtype))
            return jax.lax.all_gather(out, axis, axis=0, tiled=True)
        sub = lr.shape[0] // win.shape[0]
        chunk = sub * SUB
        he = hc * chunk
        xh = xx[hot_ids]
        out = None
        f = None
        for (c0, c1, e0, e1, src) in ((0, hc, 0, he, xh),
                                      (hc, win.shape[0], he, col.shape[0],
                                       xx)):
            if c1 == c0:
                continue
            g = src[col[e0:e1]]
            msgs = make_msgs(g, val[e0:e1],
                             None if vb is None else vb[e0:e1])
            if out is None:
                f = msgs.shape[1]
                out = jnp.zeros((nw * window, f), jnp.float32)
            out = _scatter_accum(
                win[c0:c1], lr[c0 * sub:c1 * sub], msgs, out,
                window=window, interpret=interpret,
                precision=_kernel_precision(msgs.dtype, prec))
        out = out[:rows_per]
        if gather_dtype is not None:
            out = jax.lax.optimization_barrier(out.astype(gather_dtype))
        return jax.lax.all_gather(out, axis, axis=0, tiled=True)

    args = (S.win, S.local_rows, S.visited, S.col, S.val)
    if has_b:
        args = args + (S.val_b,)
    if split:
        args = args + (S.hot_ids,)
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
    # gather straight from a message-dtype table (bf16 rows halve the
    # gather's read traffic, the dominant cost of each shard's apply —
    # same pre-cast the single-chip tier does in _dual_forward_stacked);
    # in bf16-message mode the result all-gather also rides in bf16
    # (halves the dominant per-apply collective; consumers re-cast to
    # the message dtype anyway)
    gdt = mdt if mdt != x.dtype else None
    return _local_apply(S, x.astype(mdt), make_msgs,
                        gather_dtype=gdt).astype(x.dtype)


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

def _unsplit_cols(op, valid_idx: np.ndarray) -> np.ndarray:
    """Original column ids of the given flat-layout edge positions.

    Col-split operators store compact indices into x[hot_ids] for edges
    in the hot section (leading hot chunks / blocks); map those back so
    re-partitioning sees real column ids.
    """
    col = np.asarray(op.col).reshape(-1)[valid_idx]
    if op.hot_ids is None:
        return col
    if op.plan is not None:
        chunk = (op.plan.local_rows.shape[0]
                 // op.plan.win.shape[0]) * SUB
        hot_edges = op.plan.hot_chunks * chunk
    else:
        hot_edges = op.stream.hot_blocks * op.stream.edges_per_block
    hot_ids = np.asarray(op.hot_ids)
    is_hot = valid_idx < hot_edges
    out = col.astype(np.int64).copy()
    out[is_hot] = hot_ids[col[is_hot]]
    return out


def _coo_from_mxu(m) -> tuple:
    """(row, col, val) numpy triples of the valid edges of an MXUCoo."""
    if m.plan is not None:
        gr = np.asarray(m.plan.global_rows)
        valid = np.flatnonzero(gr < m.plan.num_rows)
        return (gr[valid], _unsplit_cols(m, valid),
                np.asarray(m.val).reshape(-1)[valid])
    st = m.stream
    window = st.window
    # per-chunk window ids -> per-edge rows; local_rows==window marks padding
    lr = np.asarray(st.local_rows).reshape(st.win.shape[0], -1)  # [S, E_blk]
    win = np.repeat(np.asarray(st.win),
                    lr.shape[1] // st.win.shape[1], axis=1)
    valid = np.flatnonzero((lr < window).reshape(-1))
    rows = (win * window + lr).reshape(-1)[valid]
    return (rows, _unsplit_cols(m, valid),
            np.asarray(m.val).reshape(-1)[valid])


def _planned_valid_edges(obj) -> tuple:
    """(rows, valid_idx) of the valid edges of a plan/stream-holding
    layout (MXUCoo, mxu DualPropagator, or mxu MagneticTemplate)."""
    if obj.plan is not None:
        gr = np.asarray(obj.plan.global_rows)
        valid = np.flatnonzero(gr < obj.plan.num_rows)
        return gr[valid], valid
    st = obj.stream
    window = st.window
    lr = np.asarray(st.local_rows).reshape(st.win.shape[0], -1)
    win = np.repeat(np.asarray(st.win),
                    lr.shape[1] // st.win.shape[1], axis=1)
    valid = np.flatnonzero((lr < window).reshape(-1))
    return (win * window + lr).reshape(-1)[valid], valid


def _coo_from_dual(d) -> tuple:
    """(row, col, val_a, val_b) of the valid edges of an mxu DualPropagator."""
    rows, valid = _planned_valid_edges(d)
    return (rows, _unsplit_cols(d, valid),
            np.asarray(d.val_a).reshape(-1)[valid],
            np.asarray(d.val_b).reshape(-1)[valid])


# ---------------------------------------------------------------------------
# Sharded trainable-q templates: per-device plans whose per-edge operator
# values are rebuilt from (a_norm, theta) inside shard_map for a traced
# phase q — multi-chip trainable q at the same one-gather cost as the
# frozen sharded dual.  The backward is ONE shard_map over the transposed
# partition running the fused scatter+SDDMM kernel per device
# (ops.pallas.scatter_mxu._dual_bwd_matmul): dx comes back through a
# tiled all-gather, dq through a psum of the per-device SDDMM partials.

def build_sharded_template(tmpl, mesh: Mesh, axis: str = "graph"):
    """Re-partition a built mxu MagneticTemplate across ``axis``.

    Returns a MagneticTemplate with mode="mxu_sharded" whose ``plan``
    holds a ShardedMXU carrying (a_norm, theta) in its (val, val_b)
    slots.  Apply with spectral.magnetic.template_dual_apply.
    """
    from ..spectral.magnetic import MagneticTemplate

    rows, valid = _planned_valid_edges(tmpl)
    col = _unsplit_cols(tmpl, valid)   # map compact hot ids back
    a = np.asarray(tmpl.a_norm).reshape(-1)[valid]
    th = np.asarray(tmpl.theta).reshape(-1)[valid]
    S = build_sharded_mxu(rows, col, a, tmpl.num_nodes, tmpl.num_nodes,
                          mesh, axis, val_b=th, col_split=False)
    return MagneticTemplate(a_norm=None, theta=None, row=None, col=None,
                            num_nodes=tmpl.num_nodes, mode="mxu_sharded",
                            plan=S)


def _template_terms(a, th, q):
    """Per-edge operator values and d(value)/dq for a traced phase q.

    Same formulas as spectral.magnetic._template_values / _tda_bwd
    (incl. the conv's baked transpose negation of the imaginary part);
    cos is even and sin odd in theta, so they hold unchanged in the
    transposed plan's edge order.
    """
    ang = (2.0 * jnp.pi) * q * th
    scale = (2.0 * jnp.pi) * th * a
    va = -a * jnp.cos(ang)
    vb = a * jnp.sin(ang)
    wa = scale * jnp.sin(ang)
    wb = scale * jnp.cos(ang)
    return va, vb, wa, wb


def _sharded_template_forward(S: ShardedMXU, q, x):
    # same owner-computes body as the frozen sharded dual (_local_apply);
    # only the per-edge values differ — rebuilt in-shard from the
    # (a_norm, theta) stored in the (val, val_b) slots for the traced q,
    # which the closure carries into the shard_map body (replicated).
    from ..ops.spmm import get_message_dtype

    mdt = get_message_dtype() or x.dtype
    fa = x.shape[1] // 2
    lane = jnp.arange(x.shape[1]) < fa
    qv = jnp.asarray(q, jnp.float32)

    def make_msgs(g, a, th):
        va, vb, _, _ = _template_terms(a, th, qv)
        return (g * jnp.where(lane[None, :], va[:, None],
                              vb[:, None])).astype(mdt)

    # gather from the message-dtype table (see _forward); bf16 result
    # all-gather in bf16-message mode, same as the frozen dual
    gdt = mdt if mdt != x.dtype else None
    return _local_apply(S, x.astype(mdt), make_msgs,
                        gather_dtype=gdt).astype(x.dtype)


@jax.custom_vjp
def sharded_template_dual_apply(S: ShardedMXU, q, x: jnp.ndarray):
    """[L_re x_a | L_im x_b] for a traced phase q across the mesh."""
    return _sharded_template_forward(S, q, x)


def _stda_fwd(S, q, x):
    return _sharded_template_forward(S, q, x), (S, q, x)


def _stda_bwd(res, g):
    from ..ops.pallas.scatter_mxu import (
        _dual_bwd_matmul, _kernel_precision)
    from ..ops.spmm import get_matmul_precision, get_message_dtype

    S, q, x = res
    T = S.transposed
    if T is None:
        raise ValueError("sharded template built without a transpose")
    axis, window = T.axis, T.window
    rows_per, nw = T.rows_per_device, T.num_windows
    interpret = jax.default_backend() != "tpu"
    prec = get_matmul_precision()
    mdt = get_message_dtype() or g.dtype
    fa = x.shape[1] // 2
    f2 = x.shape[1]
    n_dev = T.n_devices
    # x rows owned by transpose-device d: [d*rows_per, (d+1)*rows_per)
    x_pad = jnp.pad(x, ((0, n_dev * rows_per - x.shape[0]), (0, 0)))

    @functools.partial(
        shard_map, mesh=T.mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None), P(),
                  P(None, None), P(None, None)),
        out_specs=(P(None, None), P()), check_vma=False)
    def run(win, lr, visited, col, a, th, q, gg, xp):
        win, lr, visited = win[0], lr[0], visited[0]
        col, a, th = col[0], a[0], th[0]
        va, vb, wa, wb = _template_terms(a, th, q[0])
        ge = gg.astype(mdt)[col]
        d = jax.lax.axis_index(axis)
        x_loc = jax.lax.dynamic_slice(xp, (d * rows_per, 0),
                                      (rows_per, f2))
        x_loc = jnp.pad(x_loc, ((0, nw * window - rows_per), (0, 0)))
        out, acc = _dual_bwd_matmul(
            win, lr,
            va.reshape(-1, SUB).astype(jnp.float32),
            vb.reshape(-1, SUB).astype(jnp.float32),
            wa.reshape(-1, SUB).astype(jnp.float32),
            wb.reshape(-1, SUB).astype(jnp.float32),
            ge, x_loc, nw, window=window, fa=fa,
            interpret=interpret,
            precision=_kernel_precision(ge.dtype, prec))
        mask = jnp.repeat(visited, window)[:rows_per]
        out = jnp.where(mask[:, None], out[:rows_per, :f2], 0.0)
        dx = jax.lax.all_gather(out, axis, axis=0, tiled=True)
        dq = jax.lax.psum(jnp.sum(acc), axis)
        return dx, dq

    dx, dq = run(T.win, T.local_rows, T.visited, T.col, T.val, T.val_b,
                 jnp.asarray(q, jnp.float32)[None], g, x_pad)
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), S)
    return (zero, dq.astype(jnp.asarray(q).dtype),
            dx[: T.num_rows].astype(g.dtype))


sharded_template_dual_apply.defvjp(_stda_fwd, _stda_bwd)
