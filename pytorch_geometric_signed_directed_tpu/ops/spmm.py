"""SpMM: sparse-adjacency × dense-features, the hot op of every GNN layer.

Three execution tiers, chosen statically at preprocessing time:

  * ``segment``  — gather + sorted ``segment_sum``.  General, any size.
  * ``mxu``      — Pallas scatter-as-matmul kernel (ops/pallas/scatter_mxu):
                   the sorted segment-sum becomes on-the-fly one-hot
                   matmuls on the MXU; ~2x the segment tier on TPU with
                   exact f32 accumulation.  Auto default for large graphs.
  * ``dense``    — materialise A once and ride the MXU with a plain matmul.
                   For every headline dataset in the reference
                   (cora_ml N=2995, telegram N=245, bitcoin_otc N=5881 —
                   SURVEY.md §6) a dense [N,N]·[N,F] matmul is far below
                   MXU saturation and is the speed-of-light choice.
  * ``bsr``      — Pallas block-sparse kernel (ops/pallas/bsr_spmm.py):
                   128×128 dense sub-blocks, scalar-prefetched block column
                   ids, MXU matmul per block.  For large graphs that don't
                   fit dense.

All tiers are differentiable (the Pallas tier via custom VJP whose backward
is the transposed-operator forward).

Replaces the reference's per-propagate torch_scatter dispatch
(/root/reference/torch_geometric_signed_directed/nn/directed/MagNetConv.py:196-240,
 nn/general/conv_base.py:111, nn/signed/SGCNConv.py:101-123).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from .coo import COO, build_coo
from .segment import segment_sum

# Graphs at or below this many nodes use the dense-MXU tier by default.
_DENSE_AUTO_MAX_NODES = 8192

# MXU precision for dense-tier adjacency matmuls.  HIGHEST (multi-pass
# f32-accurate) is the default because allclose parity with the f32
# reference is a stated target (BASELINE.md); benchmarks can trade it via
# set_matmul_precision("default"|"high"|"highest").
_MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def set_matmul_precision(p) -> None:
    global _MATMUL_PRECISION
    if isinstance(p, str):
        p = {"default": jax.lax.Precision.DEFAULT,
             "high": jax.lax.Precision.HIGH,
             "highest": jax.lax.Precision.HIGHEST}[p]
    _MATMUL_PRECISION = p


def get_matmul_precision():
    return _MATMUL_PRECISION


# Optional reduced-precision storage for the [E, F] message stream of the
# mxu tier (None = keep f32).  TPU HBM tiles pad f32 rows to 128 lanes, so
# message traffic dominates large sparse applies; bf16 halves it while the
# one-hot scatter kernel still accumulates in f32 (preferred_element_type).
# Throughput knob — leave None when strict f32 parity matters.
_MESSAGE_DTYPE = None


def set_message_dtype(dt) -> None:
    global _MESSAGE_DTYPE
    if isinstance(dt, str):
        dt = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
              "f32": None, "float32": None, "none": None}[dt.lower()]
    _MESSAGE_DTYPE = dt


def get_message_dtype():
    return _MESSAGE_DTYPE


def spmm_coo(A: COO, x: jnp.ndarray) -> jnp.ndarray:
    """out[row] += val * x[col]  — i.e. ``A @ x`` for 2-D x [M, F]."""
    msgs = A.val[:, None] * x[A.col]
    return segment_sum(msgs, A.row, A.num_nodes, indices_are_sorted=True)


@struct.dataclass
class Propagator:
    """A frozen linear operator ``x -> A @ x`` with a static execution tier.

    Built once per (graph, normalization) at preprocessing time — the
    TPU-native replacement for the reference layers' ``cached=True``
    Laplacian caching (MagNetConv.py:144-183).
    """

    coo: Optional[COO]
    dense: Optional[jnp.ndarray]
    bsr: Optional[object]  # ops.pallas.bsr_spmm.BSR
    mode: str = struct.field(pytree_node=False)
    mxu: Optional[object] = None  # ops.pallas.scatter_mxu.MXUCoo

    @property
    def num_nodes(self) -> int:
        if self.mode == "dense":
            return self.dense.shape[0]
        if self.mode == "bsr":
            return self.bsr.num_rows
        if self.mode in ("mxu", "mxu_sharded"):
            return self.mxu.num_rows
        return self.coo.num_nodes

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.mode == "dense":
            if self.dense.dtype == jnp.bfloat16:
                # bandwidth-optimized storage: the [N, N] operator is the
                # bytes bottleneck of the dense tier; bf16 halves the HBM
                # traffic per apply while accumulating in f32 on the MXU.
                return jnp.dot(self.dense, x.astype(jnp.bfloat16),
                               preferred_element_type=jnp.float32
                               ).astype(x.dtype)
            # Full-f32 MXU passes by default: adjacency matvecs feed
            # Chebyshev recurrences and cut losses where bf16 drift
            # compounds (see set_matmul_precision).
            return jnp.dot(self.dense, x, preferred_element_type=x.dtype,
                           precision=_MATMUL_PRECISION)
        if self.mode == "bsr":
            from .pallas.bsr_spmm import bsr_spmm

            return bsr_spmm(self.bsr, x)
        if self.mode == "mxu":
            from .pallas.scatter_mxu import mxu_spmm

            return mxu_spmm(self.mxu, x)
        if self.mode == "mxu_sharded":
            # multi-chip: per-device Pallas scatter plans under shard_map
            # (parallel.mxu_shard); self.mxu holds a ShardedMXU
            from ..parallel.mxu_shard import sharded_mxu_spmm

            return sharded_mxu_spmm(self.mxu, x)
        return spmm_coo(self.coo, x)


def make_propagator(
    row,
    col,
    val=None,
    num_nodes: Optional[int] = None,
    *,
    mode: str = "auto",
    pad_to: Optional[int] = None,
    dtype=np.float32,
) -> Propagator:
    """Host-side factory.  ``mode`` in {'auto', 'segment', 'dense', 'bsr'}."""
    A = build_coo(row, col, val, num_nodes, pad_to=pad_to, dtype=dtype)
    return propagator_from_coo(A, mode=mode)


def propagator_from_coo(A: COO, mode: str = "auto",
                        dense_dtype=None) -> Propagator:
    """``dense_dtype=jnp.bfloat16`` stores the dense operator in bf16
    (half the HBM traffic, f32 accumulation) — for throughput-focused
    training where strict f32 parity isn't required."""
    if mode == "auto":
        # small graphs ride the dense MXU tier; larger ones use the Pallas
        # scatter-as-matmul kernel (~2x the XLA segment tier on TPU, exact
        # f32) — the plain segment tier remains available explicitly
        mode = ("dense" if max(A.num_nodes, A.num_cols)
                <= _DENSE_AUTO_MAX_NODES else "mxu")
    if mode == "dense":
        dense = A.to_dense()
        # guard against silent device-scatter corruption (observed on a
        # tunneled v5e runtime: eager scatters into >40MB outputs returned
        # all-zeros) — this runs once at preprocessing, so the host check
        # is free relative to the build
        if A.nnz and np.abs(np.asarray(A.val)).max() > 0 and \
                not np.asarray(jnp.abs(dense).max() > 0):
            import warnings

            warnings.warn(
                "device scatter produced an all-zero dense operator; "
                "rebuilding on host (known TPU-runtime eager-scatter bug)")
            host = np.zeros((A.num_nodes + 1, A.num_cols), np.float32)
            np.add.at(host, (np.asarray(A.row), np.asarray(A.col)),
                      np.asarray(A.val, np.float32))
            dense = jnp.asarray(host[: A.num_nodes])
        if dense_dtype is not None:
            dense = dense.astype(dense_dtype)
        return Propagator(coo=None, dense=dense, bsr=None, mode="dense")
    if mode == "bsr":
        from .pallas.bsr_spmm import bsr_from_coo

        return Propagator(coo=None, dense=None, bsr=bsr_from_coo(A), mode="bsr")
    if mode == "mxu":
        from .pallas.scatter_mxu import mxu_from_coo

        return Propagator(coo=None, dense=None, bsr=None,
                          mxu=mxu_from_coo(A), mode="mxu")
    return Propagator(coo=A, dense=None, bsr=None, mode="segment")


@struct.dataclass
class DualPropagator:
    """Two same-sparsity linear operators applied as ONE gather + scatter.

    The XLA row gather is row-count-bound up to 128 lanes (measured on
    v5e: 2M rows cost ~5 ms at F=32, 64 and 128 alike), so applying two
    operators that share an edge structure to two feature blocks stacked
    along lanes halves the dominant cost of the sparse tier.  This is the
    TPU-native fusion of MagNetConv's multi-stream propagate chain
    (reference nn/directed/MagNetConv.py:196-240).

    ``col``/``row``/``plan`` describe the shared structure; ``val_a``/
    ``val_b`` the two weight sets.  ``transposed`` makes the backward a
    fused forward of the transpose (custom VJP).
    """

    col: jnp.ndarray
    row: Optional[jnp.ndarray]          # segment mode only
    val_a: jnp.ndarray
    val_b: jnp.ndarray
    plan: Optional[object]              # ops.pallas.scatter_mxu.ScatterPlan
    num_nodes: int = struct.field(pytree_node=False)
    num_cols: int = struct.field(pytree_node=False)
    mode: str = struct.field(pytree_node=False)
    transposed: object = None           # Optional[DualPropagator]
    stream: Optional[object] = None     # ops.pallas.scatter_mxu.StreamPlan
    # col-split layouts: hot edges' col ids index x[hot_ids] (see
    # ops.pallas.scatter_mxu.col_degree_split); None = unsplit
    hot_ids: Optional[jnp.ndarray] = None


def dual_propagator(row, col, val_a, val_b, num_nodes: Optional[int] = None,
                    num_cols: Optional[int] = None, mode: str = "auto",
                    with_transpose: bool = True) -> Optional[DualPropagator]:
    """Build a fused operator pair from one shared (row, col) edge list.

    Returns None for tiers where fusion buys nothing (dense/bsr) — callers
    fall back to applying the two operators separately.
    """
    row = np.asarray(row, np.int64)
    col = np.asarray(col, np.int64)
    val_a = np.asarray(val_a, np.float32)
    val_b = np.asarray(val_b, np.float32)
    num_nodes = int(num_nodes if num_nodes is not None
                    else (row.max() + 1 if row.size else 0))
    num_cols = int(num_cols) if num_cols is not None else num_nodes
    if mode == "auto":
        mode = ("dense" if max(num_nodes, num_cols) <= _DENSE_AUTO_MAX_NODES
                else "mxu")
    if mode not in ("mxu", "segment"):
        return None

    # The transposed twin's plan build is independent of the forward's —
    # overlap them in a worker thread (the heavy pieces — native radix
    # argsort, numpy permutes, device transfers — all release the GIL).
    # Measured at WikiTalk scale this shaves ~25-30% off the two-build tail.
    t_fut = None
    if with_transpose:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as ex:
            t_fut = ex.submit(dual_propagator, col, row, val_a, val_b,
                              num_cols, num_nodes, mode=mode,
                              with_transpose=False)
            fwd = _dual_propagator_one(row, col, val_a, val_b, num_nodes,
                                       num_cols, mode)
            t = t_fut.result()
        return fwd.replace(transposed=t)
    return _dual_propagator_one(row, col, val_a, val_b, num_nodes,
                                num_cols, mode)


def _dual_propagator_one(row, col, val_a, val_b, num_nodes: int,
                         num_cols: int, mode: str,
                         t: Optional["DualPropagator"] = None):
    """One direction of dual_propagator (no transpose recursion)."""
    if mode == "mxu":
        from .pallas.scatter_mxu import (
            STREAM_BLOCK_EDGES,
            STREAM_THRESHOLD_EDGES,
            _build_plan_host,
            _plan_from_host,
            _stream_from_host,
            col_degree_split,
            permute_edge_data,
        )

        split = col_degree_split(col, num_cols)
        grp, hot_ids, col_g = None, None, col
        if split is not None:
            grp, col_g, hot_ids = split
            hot_ids = jnp.asarray(hot_ids)
        h = _build_plan_host(row, num_nodes, group=grp)
        if len(h["perm"]) > STREAM_THRESHOLD_EDGES:   # padded plan size
            stream, perm = _stream_from_host(h, STREAM_BLOCK_EDGES)
            col_p, va_p, vb_p = permute_edge_data(
                perm, col_g.astype(np.int32), val_a, val_b)
            s = stream.win.shape[0]
            return DualPropagator(
                col=jnp.asarray(col_p).reshape(s, -1), row=None,
                val_a=jnp.asarray(va_p).reshape(s, -1),
                val_b=jnp.asarray(vb_p).reshape(s, -1),
                plan=None, num_nodes=num_nodes, num_cols=num_cols,
                mode="mxu", transposed=t, stream=stream, hot_ids=hot_ids)
        plan, perm = _plan_from_host(h)
        col_p, va_p, vb_p = permute_edge_data(
            perm, col_g.astype(np.int32), val_a, val_b)
        return DualPropagator(
            col=jnp.asarray(col_p), row=None, val_a=jnp.asarray(va_p),
            val_b=jnp.asarray(vb_p), plan=plan, num_nodes=num_nodes,
            num_cols=num_cols, mode="mxu", transposed=t, hot_ids=hot_ids)
    A = build_coo(row, col, val_a, num_nodes, num_cols=num_cols)
    B = build_coo(row, col, val_b, num_nodes, num_cols=num_cols)
    return DualPropagator(
        col=A.col, row=A.row, val_a=A.val, val_b=B.val, plan=None,
        num_nodes=num_nodes, num_cols=num_cols, mode="segment", transposed=t)


def propagators_from_dual(D: DualPropagator) -> Tuple[Propagator, Propagator]:
    """Split a fused pair into two standalone Propagators for free.

    The dual already holds the scatter plan (or stream) plus both value
    sets in plan order, so the standalone A and B operators are just views
    over its tensors — no plan rebuild, no host<->device round-trip.  At
    WikiTalk scale this replaces ~2/3 of preprocessing (4 of 6 host plan
    constructions plus six multi-second device fetches, measured).
    """
    if D.mode == "mxu":
        from .pallas.scatter_mxu import MXUCoo

        def one(d, which):
            t = one(d.transposed, which) if d.transposed is not None else None
            return MXUCoo(plan=d.plan,
                          col=d.col,
                          val=d.val_a if which == "a" else d.val_b,
                          num_cols=d.num_cols, transposed=t,
                          stream=d.stream, hot_ids=d.hot_ids)

        return (Propagator(coo=None, dense=None, bsr=None,
                           mxu=one(D, "a"), mode="mxu"),
                Propagator(coo=None, dense=None, bsr=None,
                           mxu=one(D, "b"), mode="mxu"))
    if D.mode != "segment":
        raise ValueError(f"cannot split a {D.mode!r}-tier dual")
    A = COO(row=D.row, col=D.col, val=D.val_a,
            num_nodes=D.num_nodes, num_cols=D.num_cols,
            nnz=int(D.row.shape[0]))
    B = COO(row=D.row, col=D.col, val=D.val_b,
            num_nodes=D.num_nodes, num_cols=D.num_cols,
            nnz=int(D.row.shape[0]))
    return (Propagator(coo=A, dense=None, bsr=None, mode="segment"),
            Propagator(coo=B, dense=None, bsr=None, mode="segment"))


@jax.custom_vjp
def dual_spmm_stacked(D: DualPropagator, x: jnp.ndarray) -> jnp.ndarray:
    """[A x_a | B x_b] for lane-stacked x = [x_a | x_b] ([N, 2F]).

    One gather + one scatter; the per-edge weight selection is a fused
    elementwise ``where`` over the lane index, so no lane-concat relayouts
    touch the [E, 2F] message stream.  Keeping the Chebyshev state stacked
    across calls (nn/directed/magnet_conv.dual_chebyshev_stacks) removes
    the per-order split/concat copies entirely.
    """
    return _dual_forward_stacked(D, x)


def _dual_forward_stacked(D, x):
    if x.shape[1] % 2:
        raise ValueError(
            f"dual_spmm_stacked needs an even lane-stacked width, got "
            f"{x.shape[1]}")
    if D.mode == "mxu_sharded":
        from ..parallel.mxu_shard import sharded_mxu_spmm

        return sharded_mxu_spmm(D.plan, x)
    fa = x.shape[1] // 2
    lane = jnp.arange(2 * fa) < fa
    # reduced-precision message storage only on the mxu tier, where the
    # scatter kernel accumulates in f32 regardless (XLA segment_sum would
    # accumulate in the message dtype)
    mdt = (get_message_dtype() or x.dtype) if D.mode == "mxu" else x.dtype
    # gather straight from message-dtype tables on the sparse tiers:
    # bf16 rows halve the gather's read traffic and measure ~15% faster
    # (the multiply below still runs in f32)
    xg = x.astype(mdt) if D.mode == "mxu" else x
    x_hot = xg[D.hot_ids] if D.hot_ids is not None else None
    if D.stream is not None:
        from .pallas.scatter_mxu import streamed_scatter

        def make_msgs(g, i):
            return (g * jnp.where(lane[None, :], D.val_a[i][:, None],
                                  D.val_b[i][:, None])).astype(mdt)

        out = streamed_scatter(D.stream, D.col, make_msgs, xg, 2 * fa,
                               get_matmul_precision(), x_hot=x_hot)
        return out.astype(x.dtype)
    if x_hot is not None:
        from .pallas.scatter_mxu import split_scatter_accum

        def make_msgs_slice(g, lo, hi):
            return (g * jnp.where(lane[None, :], D.val_a[lo:hi][:, None],
                                  D.val_b[lo:hi][:, None])).astype(mdt)

        out = split_scatter_accum(D.plan, D.col, make_msgs_slice, xg, x_hot,
                                  2 * fa, get_matmul_precision())
        return out.astype(x.dtype)
    g = xg[D.col] if D.mode == "mxu" else x[D.col]
    msgs = (g * jnp.where(lane[None, :], D.val_a[:, None],
                          D.val_b[:, None])).astype(mdt)
    if D.mode == "mxu":
        from .pallas.scatter_mxu import scatter_sum

        return scatter_sum(D.plan, msgs).astype(x.dtype)
    return segment_sum(msgs, D.row, D.num_nodes, indices_are_sorted=True)


def _dual_fwd(D, x):
    return _dual_forward_stacked(D, x), D


def _dual_bwd(D, g):
    if D.transposed is None:
        raise ValueError("dual_propagator(with_transpose=False) is not "
                         "differentiable")
    zero = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), D)
    return zero, _dual_forward_stacked(D.transposed, g)


dual_spmm_stacked.defvjp(_dual_fwd, _dual_bwd)


@jax.custom_vjp
def dual_spmm_stacked_trainable(D: DualPropagator, x: jnp.ndarray):
    """dual_spmm_stacked whose backward ALSO produces per-edge value
    cotangents (dval[e] = sum_f g[row_e, f] x[col_e, f] over each lane
    half, an SDDMM) — the path for *trainable* operator values, e.g. the
    trainable-q magnetic Laplacian where val_a/val_b are functions of q
    (reference MagNetConv.py:141-142 clamps and rebuilds q each forward).
    The frozen variant (dual_spmm_stacked) skips this reduction, which is
    the common case.  Flat plans and segment mode only (streamed giant
    graphs keep q frozen)."""
    return _dual_forward_stacked(D, x)


def _dual_t_fwd(D, x):
    return _dual_forward_stacked(D, x), (D, x)


def _dual_t_bwd(res, g):
    D, x = res
    if D.hot_ids is not None:
        raise ValueError("trainable operator values are not supported on "
                         "col-split duals (hot cols are remapped); build "
                         "the template path instead")
    if D.stream is not None:
        raise ValueError("trainable operator values are not supported on "
                         "streamed plans; build the template with a flat "
                         "plan or the segment tier")
    if D.transposed is None:
        raise ValueError("dual_propagator(with_transpose=False) is not "
                         "differentiable")
    dx = _dual_forward_stacked(D.transposed, g)
    fa = x.shape[1] // 2
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)], axis=0)
    if D.mode == "mxu":
        ge = g_pad[D.plan.global_rows]   # padding rows index num_rows -> 0
    else:
        ge = g_pad[jnp.minimum(D.row, D.num_nodes)]
    xe = x[D.col]
    prod = ge * xe
    dva = prod[:, :fa].sum(1)
    dvb = prod[:, fa:].sum(1)
    dD = jax.tree.map(
        lambda p: (jnp.zeros_like(p)
                   if jnp.issubdtype(p.dtype, jnp.floating)
                   else np.zeros(p.shape, jax.dtypes.float0)), D)
    dD = dD.replace(val_a=dva.astype(D.val_a.dtype),
                    val_b=dvb.astype(D.val_b.dtype))
    return dD, dx


dual_spmm_stacked_trainable.defvjp(_dual_t_fwd, _dual_t_bwd)


def dual_spmm(D: DualPropagator, x_a: jnp.ndarray, x_b: jnp.ndarray):
    """(A x_a, B x_b) for same-structure A, B — one gather, one scatter."""
    if x_a.shape[1] != x_b.shape[1]:
        raise ValueError(
            f"dual_spmm operands must share a feature width (the lane "
            f"split assigns val_a/val_b by halves); got {x_a.shape[1]} "
            f"vs {x_b.shape[1]}")
    fa = x_a.shape[1]
    out = dual_spmm_stacked(D, jnp.concatenate([x_a, x_b], axis=1))
    return out[:, :fa], out[:, fa:]


def complex_spmm(
    P_re: Propagator, P_im: Propagator, x_re: jnp.ndarray, x_im: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L_re + i·L_im) @ (x_re + i·x_im), as two real pairs.

    Full complex product — note the reference's MagNetConv does NOT use this
    (see models/magnet.py for the exact reference recurrence); provided for
    the genuinely-complex spectral utilities.
    """
    a, b = P_re(x_re), P_im(x_im)
    c, d = P_re(x_im), P_im(x_re)
    return a - b, c + d
