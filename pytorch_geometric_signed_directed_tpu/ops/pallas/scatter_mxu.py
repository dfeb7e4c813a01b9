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

WINDOW = 128  # default output rows per window
CHUNK = 1024  # fallback edges per grid step (see _pick_geometry)
SUB = 128

# Measured pipeline constants on TPU v5e (scratch micro-bench, E=2M/F=32):
# each grid step costs ~1.35us of fixed overhead regardless of block bytes,
# every padded edge rides the expensive XLA row-gather (~2.4ns/edge), and
# the on-the-fly one-hot costs window*chunk/1024 VPU cycles per chunk.
# _pick_geometry trades the three: big chunks amortize step overhead, small
# chunks avoid padding low-degree windows up to the chunk size, and bigger
# windows pool low-degree rows so bigger chunks stay affordable.
_STEP_OVERHEAD_NS = 1350.0
_GATHER_NS_PER_EDGE = 2.4
_VPU_NS_PER_CYCLE = 1.064



def _kernel_precision(dtype, precision):
    """bf16 kernel operands cannot take the multi-pass fp32 contract
    precisions on the MXU (Mosaic rejects "Bad lhs type"); bf16 message
    storage implies single-pass passes anyway."""
    if dtype == jnp.bfloat16:
        return jax.lax.Precision.DEFAULT
    return precision


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_geometry(row_sorted: np.ndarray, num_rows: int,
                   group_sorted: Optional[np.ndarray] = None):
    """Choose (window, chunk) minimizing step overhead + padded-gather +
    one-hot cost for this degree profile.  VMEM guard: the [window, chunk]
    one-hot must stay within ~4MB f32.  With a hot/cold ``group`` each
    (window, group) run pads separately, so the model counts those bins."""
    best, best_cost = (WINDOW, CHUNK), float("inf")
    # One bincount at the finest window; wider windows' histograms are
    # pair-sums of it (row//256 == (row//128)//2) — the bincount over the
    # edge list is the dominant cost of geometry selection at giant scale.
    nw128 = _round_up(max(num_rows, 1), 512) // 128
    c128 = None
    if len(row_sorted) >= (1 << 20):
        from ...native import window_hist

        ngrp = 1 if group_sorted is None else 2
        h = window_hist(row_sorted, group_sorted, nw128 * ngrp)
        if h is not None:
            c128 = h.reshape(nw128, ngrp)
    if c128 is None:
        bins128 = row_sorted // 128
        if group_sorted is not None:
            c128 = np.bincount(bins128 * 2 + group_sorted,
                               minlength=nw128 * 2).reshape(nw128, 2)
        else:
            c128 = np.bincount(bins128, minlength=nw128)[:, None]
    for window in (128, 256, 512):
        f = window // 128
        counts = c128.reshape(nw128 // f, f, -1).sum(axis=1).ravel()
        counts = counts[counts > 0]
        # chunk >= 1024 keeps local-row blocks at >= 8 sublanes (Mosaic
        # requires the block's second-to-last dim divisible by 8)
        for chunk in (1024, 2048, 4096, 8192):
            if window * chunk * 4 > 4 * 1024 * 1024:
                continue
            padded = int(np.sum((counts + chunk - 1) // chunk)) * chunk
            steps = padded // chunk
            cost = (steps * _STEP_OVERHEAD_NS
                    + padded * _GATHER_NS_PER_EDGE
                    + steps * (window * chunk / 1024.0) * _VPU_NS_PER_CYCLE)
            if cost < best_cost:
                best, best_cost = (window, chunk), cost
    return best


@struct.dataclass
class ScatterPlan:
    """Host-built edge layout: chunks never cross a `window`-row window.

    perm maps plan order -> original edge order (host numpy, not a leaf).
    local_rows holds row % window (window marks padding); global_rows holds
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
    window: int = struct.field(pytree_node=False, default=WINDOW)
    # leading chunks whose gather rides the compact hot-column table
    # (col-split plans; 0 = unsplit).  Window ids are non-decreasing
    # within each of the two chunk sections.
    hot_chunks: int = struct.field(pytree_node=False, default=0)


def _build_plan_host(row, num_rows: int, chunk: Optional[int] = None,
                     window: Optional[int] = None,
                     group: Optional[np.ndarray] = None):
    """Host-side plan construction shared by the flat and streamed builders.

    Returns a dict of numpy arrays: perm (plan order -> original edge, -1
    padding), lr (local rows, `window` marks padding), gr (global rows,
    num_rows marks padding), win (per-chunk window id, non-decreasing),
    visited, plus the resolved (window, chunk, num_windows, e).

    ``group`` (optional, int8 in {0, 1} per edge) splits every window run
    into a group-0 section and a group-1 section, each padded to chunk
    multiples, and orders all group-0 chunks before all group-1 chunks
    (window ids non-decreasing within each section) — the layout of the
    hot/cold column split (see col_degree_split).
    """
    from ... import native
    from ...native import stable_argsort

    row = np.asarray(row, np.int64)
    e = len(row)
    if window is None and chunk is None:
        # histogram-based; row/group order is irrelevant, only alignment
        window, chunk = _pick_geometry(row, num_rows,
                                       None if group is None
                                       else np.asarray(group))
    window = WINDOW if window is None else window
    if chunk is None:
        chunk = CHUNK
    assert chunk % SUB == 0, f"chunk must be a multiple of {SUB}"
    assert window % WINDOW == 0, f"window must be a multiple of {WINDOW}"
    if e >= (1 << 20):
        # fused native layout: one radix argsort by the (group-major,
        # window, local-row) key + one threaded bin pass — bit-identical
        # to the numpy pipeline below (tests/test_native.py), ~6x faster
        # at WikiTalk scale
        h = native.plan_layout(row, num_rows, window, chunk, group)
        if h is not None:
            return h
    if e < 2 or np.all(row[1:] >= row[:-1]):   # pre-sorted fast path
        order = np.arange(e, dtype=np.int64)
        row_sorted = row
    else:
        order = stable_argsort(row)
        row_sorted = row[order]
    grp_sorted = None if group is None else np.asarray(group)[order]
    num_windows = _round_up(max(num_rows, 1), window) // window
    ngrp = 1 if group is None else 2
    if ngrp == 2:
        # final edge order: (window, group) bins; stable keeps row order.
        # (An O(E) cumsum-based stable partition was measured SLOWER than
        # this argsort at 16M edges — the (window, group) key is narrow,
        # so the sort runs in 1-2s while the partition's eight 16M-row
        # passes cost 2-9s; see round-4 notes.)
        key = (row_sorted // window) * 2 + grp_sorted
        o2 = stable_argsort(key)
        order = order[o2]
        row_sorted = row_sorted[o2]
        bin_of_edge = key[o2]
    else:
        bin_of_edge = row_sorted // window
    num_bins = num_windows * ngrp

    # vectorized per-bin padding layout (the per-window Python loop cost
    # minutes at WikiTalk scale): bins sorted, so each bin is one run.
    counts = np.bincount(bin_of_edge, minlength=num_bins)
    nonempty = np.flatnonzero(counts)
    visited = np.zeros(num_windows, bool)
    hot_chunks = 0
    if nonempty.size:
        visited[nonempty // ngrp] = True
        cnts = counts[nonempty]
        padded = ((cnts + chunk - 1) // chunk) * chunk
        total = int(padded.sum())
        # position of each valid edge inside the padded layout
        pad_start = np.concatenate([[0], np.cumsum(padded)[:-1]])
        src_start = np.concatenate([[0], np.cumsum(cnts)[:-1]])
        # dst index for edge j of bin k: pad_start[k] + (j - src_start[k])
        binidx = np.repeat(np.arange(nonempty.size), cnts)
        dst = (pad_start[binidx]
               + np.arange(e) - src_start[binidx]).astype(np.int64)
        perm = np.full(total, -1, np.int64)
        lr = np.full(total, window, np.int32)
        gr = np.full(total, num_rows, np.int32)
        perm[dst] = order
        lr[dst] = (row_sorted % window).astype(np.int32)
        gr[dst] = row_sorted.astype(np.int32)
        chunks_per_bin = padded // chunk
        win = np.repeat(nonempty // ngrp, chunks_per_bin).astype(np.int32)
        if ngrp == 2:
            grp_chunk = np.repeat(nonempty % 2, chunks_per_bin)
            corder = np.argsort(grp_chunk, kind="stable")
            hot_chunks = int((grp_chunk == 0).sum())
            win = win[corder]
            perm = perm.reshape(-1, chunk)[corder].reshape(-1)
            lr = lr.reshape(-1, chunk)[corder].reshape(-1)
            gr = gr.reshape(-1, chunk)[corder].reshape(-1)
    else:  # completely empty graph: one dummy padding chunk
        perm = np.full(chunk, -1, np.int64)
        lr = np.full(chunk, window, np.int32)
        gr = np.full(chunk, num_rows, np.int32)
        win = np.zeros(1, np.int32)

    return dict(perm=perm, lr=lr, gr=gr, win=win, visited=visited,
                window=window, chunk=chunk, num_windows=num_windows,
                num_edges=e, num_rows=num_rows, hot_chunks=hot_chunks)


def _plan_from_host(h) -> Tuple[ScatterPlan, np.ndarray]:
    plan = ScatterPlan(
        local_rows=jnp.asarray(h["lr"].reshape(-1, SUB)),
        global_rows=jnp.asarray(h["gr"]),
        win=jnp.asarray(h["win"]),
        visited=jnp.asarray(h["visited"]),
        num_rows=h["num_rows"], num_windows=h["num_windows"],
        num_edges=h["num_edges"], window=h["window"],
        hot_chunks=h.get("hot_chunks", 0),
    )
    return plan, h["perm"]


def build_scatter_plan(row, num_rows: int, chunk: Optional[int] = None,
                       window: Optional[int] = None) -> ScatterPlan:
    """row: destination ids of the valid edges (host numpy)."""
    return _plan_from_host(_build_plan_host(row, num_rows, chunk, window))


@struct.dataclass
class StreamPlan:
    """Window-aligned blocks of plan chunks for bounded-memory scatter.

    TPU HBM layouts pad rank-2 f32 rows to 128 lanes, so any [E, f<=128]
    message stream costs E x 512 bytes — at WikiTalk scale (N=2.4M,
    Laplacian nnz ~22M) one materialized message array exceeds HBM.  The
    stream plan splits the chunks into S window-aligned blocks; execution
    lax.scans over blocks, bounding peak per-edge memory to one block
    (see ops.spmm streamed forwards).  A window never straddles blocks, so
    the kernel's zero-on-first-chunk logic stays correct per block.
    """

    win: jnp.ndarray         # [S, C] GLOBAL window ids, non-decreasing
    local_rows: jnp.ndarray  # [S, C * chunk/SUB, SUB]
    visited: jnp.ndarray     # [num_windows] global
    num_rows: int = struct.field(pytree_node=False)
    num_windows: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    num_edges: int = struct.field(pytree_node=False)
    edges_per_block: int = struct.field(pytree_node=False)
    # leading blocks whose gather rides the compact hot-column table
    # (col-split plans; 0 = unsplit)
    hot_blocks: int = struct.field(pytree_node=False, default=0)


def _stream_from_host(h, max_edges_per_block: int):
    """Split the plan's chunk sequence into S evenly-sized blocks.

    A window's chunk run MAY straddle a block boundary: the aliased
    accumulate kernel copies the prior buffer contents on each window's
    first chunk within a block, so a window written by consecutive blocks
    accumulates correctly across the lax.scan carry.  This keeps every
    block at the byte bound even when a single hub window holds more than
    max_edges_per_block edges (which window-aligned packing would have to
    put in one oversized block).

    Col-split plans (hot_chunks > 0) never mix hot and cold chunks in one
    block: the hot chunk prefix and the cold suffix are blocked
    separately, and ``hot_blocks`` records the boundary.
    """
    chunk_sz, window_sz = h["chunk"], h["window"]
    win = h["win"]
    n_chunks = len(win)
    cap = max(1, max_edges_per_block // chunk_sz)
    hc = h.get("hot_chunks", 0)
    if 0 < hc < n_chunks:
        s_hot = max(1, -(-hc // cap))
        s_cold = max(1, -(-(n_chunks - hc) // cap))
        blocks = (np.array_split(np.arange(hc), s_hot)
                  + np.array_split(np.arange(hc, n_chunks), s_cold))
        hot_blocks = s_hot
        s = s_hot + s_cold
    else:
        s = max(1, -(-n_chunks // cap))
        blocks = np.array_split(np.arange(n_chunks), s)
        hot_blocks = s if hc else 0
    c_blk = max(len(b) for b in blocks)
    sub = chunk_sz // SUB
    lr = h["lr"].reshape(n_chunks, chunk_sz)
    perm2 = h["perm"].reshape(n_chunks, chunk_sz)

    win_b = np.zeros((s, c_blk), np.int32)
    lr_b = np.full((s, c_blk, chunk_sz), window_sz, np.int32)
    perm_b = np.full((s, c_blk, chunk_sz), -1, np.int64)
    for i, b in enumerate(blocks):
        k = len(b)
        win_b[i, :k] = win[b]
        win_b[i, k:] = win[b[-1]]   # dummy chunks: revisit the last window
        lr_b[i, :k] = lr[b]
        perm_b[i, :k] = perm2[b]

    plan = StreamPlan(
        win=jnp.asarray(win_b),
        local_rows=jnp.asarray(lr_b.reshape(s, c_blk * sub, SUB)),
        visited=jnp.asarray(h["visited"]),
        num_rows=h["num_rows"], num_windows=h["num_windows"],
        window=window_sz, num_edges=h["num_edges"],
        edges_per_block=c_blk * chunk_sz,
        hot_blocks=hot_blocks,
    )
    return plan, perm_b.reshape(-1)


def build_stream_plan(row, num_rows: int, max_edges_per_block: int,
                      chunk: Optional[int] = None,
                      window: Optional[int] = None):
    """Group plan chunks into blocks of bounded edge count.

    Returns (StreamPlan, perm) where perm is [S * edges_per_block] with -1
    for padding — feed to permute_edge_data and reshape the results to
    [S, edges_per_block].
    """
    return _stream_from_host(_build_plan_host(row, num_rows, chunk, window),
                             max_edges_per_block)


def streamed_scatter(stream: StreamPlan, col_blocks, make_msgs, x,
                     out_width: int, precision,
                     x_hot=None) -> jnp.ndarray:
    """lax.scan over blocks: gather + make_msgs + scatter, bounded memory.

    Each block accumulates directly into the shared output buffer via an
    aliased pallas call (no slice/merge traffic): a window revisited by a
    later block accumulates correctly (the kernel copies the prior buffer
    on a window's first chunk within a block) and unwritten windows pass
    through untouched.

    ``make_msgs(gathered, block_index)`` returns the [edges_per_block,
    out_width] message block.  Only used inside custom-VJP forwards (its
    own autodiff path would materialize full-size gradients).

    Col-split streams (``stream.hot_blocks`` > 0) gather the leading
    blocks from ``x_hot`` — the compact top-degree column table that
    stays under the hardware gather cliff (see col_degree_split) — and
    the rest from ``x``.
    """
    window = stream.window
    interpret = jax.default_backend() != "tpu"
    s = stream.win.shape[0]
    hb = stream.hot_blocks
    if hb and x_hot is None:
        raise ValueError("col-split stream needs x_hot (gather x[hot_ids] "
                         "before calling)")

    def section(out, lo, hi, src):
        def body(out, blk):
            i, win, lr, col = blk
            msgs = make_msgs(src[col], i)
            if msgs.dtype not in (jnp.float32, jnp.bfloat16):
                msgs = msgs.astype(jnp.float32)
            return _scatter_accum(
                win, lr, msgs, out, window=window, interpret=interpret,
                precision=_kernel_precision(msgs.dtype, precision)), None

        out, _ = jax.lax.scan(
            body, out,
            (jnp.arange(lo, hi), stream.win[lo:hi],
             stream.local_rows[lo:hi], col_blocks[lo:hi]))
        return out

    out = jnp.zeros((stream.num_windows * window, out_width), jnp.float32)
    if hb:
        out = section(out, 0, hb, x_hot)
    if hb < s:
        out = section(out, hb, s, x)
    mask = jnp.repeat(stream.visited, window)[: stream.num_rows]
    return jnp.where(mask[:, None], out[: stream.num_rows], 0.0)


# Measured on TPU v5e: the XLA row gather sustains ~350M rows/s on tables
# up to ~192k rows but only ~91M rows/s beyond — a hard row-count cliff,
# insensitive to table bytes, row width (<= 256 lanes) and index
# locality.  Operators whose column space exceeds the cliff split their
# edges by column degree: the top GATHER_FAST_ROWS columns form a compact
# "hot" table (one cheap x[hot_ids] gather per apply) from which the bulk
# of a power-law graph's edges gather at the fast rate.
GATHER_FAST_ROWS = 131_072
COL_SPLIT_MIN_COLS = 196_608
COL_SPLIT_MIN_COVERAGE = 0.25


def col_degree_split(col, num_cols: int,
                     hot_rows: Optional[int] = None):
    """Hot/cold edge partition by column degree.

    Returns None when the column space is under the gather cliff or the
    hot table would cover too few edges (uniform-degree graphs — the
    extra per-window section padding wouldn't pay for itself); otherwise
    (group[e] in {0 hot, 1 cold}, col_remapped[e], hot_ids[hot_rows])
    where hot edges index the compact table x[hot_ids].
    """
    if hot_rows is None:
        hot_rows = GATHER_FAST_ROWS
    if num_cols <= COL_SPLIT_MIN_COLS:
        return None
    col = np.asarray(col, np.int64)
    deg = np.bincount(col, minlength=num_cols)
    kth = num_cols - hot_rows
    hot_ids = np.argpartition(deg, kth)[kth:]
    if deg[hot_ids].sum() < COL_SPLIT_MIN_COVERAGE * len(col):
        return None
    hot_ids = np.sort(hot_ids)
    hot_map = np.full(num_cols, -1, np.int64)
    hot_map[hot_ids] = np.arange(hot_rows)
    m = hot_map[col]
    grp = (m < 0).astype(np.int8)
    col2 = np.where(m < 0, col, m)
    return grp, col2, hot_ids.astype(np.int32)


def split_scatter_accum(plan: ScatterPlan, col, make_msgs, x, x_hot,
                        out_width: int, precision) -> jnp.ndarray:
    """Flat-plan forward for a col-split layout: one aliased accumulate
    pass per section (hot chunks gather from the compact table, cold from
    x), into one shared zero-initialized buffer.

    ``make_msgs(gathered, lo, hi)`` returns the messages for the edge
    slice [lo:hi) of the plan-ordered arrays.  Only used inside
    custom-VJP forwards.
    """
    interpret = jax.default_backend() != "tpu"
    nchunks = plan.win.shape[0]
    sub = plan.local_rows.shape[0] // nchunks
    chunk = sub * SUB
    hc = plan.hot_chunks
    out = jnp.zeros((plan.num_windows * plan.window, out_width),
                    jnp.float32)
    for c0, c1, src in ((0, hc, x_hot), (hc, nchunks, x)):
        if c1 == c0:
            continue
        g = src[col[c0 * chunk:c1 * chunk]]
        msgs = make_msgs(g, c0 * chunk, c1 * chunk)
        if msgs.dtype not in (jnp.float32, jnp.bfloat16):
            msgs = msgs.astype(jnp.float32)
        out = _scatter_accum(plan.win[c0:c1],
                             plan.local_rows[c0 * sub:c1 * sub],
                             msgs, out, window=plan.window,
                             interpret=interpret,
                             precision=_kernel_precision(msgs.dtype,
                                                         precision))
    return out[: plan.num_rows]


def permute_edge_data(perm: np.ndarray, *arrays) -> Tuple[np.ndarray, ...]:
    """Reorder per-edge host arrays into plan order (padding -> 0)."""
    from ...native import permute_gather

    out = []
    valid = None
    for a in arrays:
        a = np.asarray(a)
        if len(perm) >= (1 << 20) and a.ndim == 1 and a.itemsize in (4, 8):
            nat = permute_gather(perm, a)   # threaded native gather
            if nat is not None:
                out.append(nat)
                continue
        padded = np.zeros((len(perm),) + a.shape[1:], a.dtype)
        if valid is None:
            valid = perm >= 0
        padded[valid] = a[perm[valid]]
        out.append(padded)
    return tuple(out)


def _kernel(win_ref, lr_ref, msgs_ref, out_ref, *, window, precision):
    """One grid step: accumulate a chunk of plan-ordered messages into the
    current `window`-row output window.

    One wide one-hot [window, chunk] and a single MXU dot per grid step —
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

    rows = jax.lax.broadcasted_iota(jnp.int32, (window, SUB), 0)
    onehot = jnp.concatenate(
        [(rows == lr_ref[a][None, :]).astype(msgs_ref.dtype)
         for a in range(lr_ref.shape[0])], axis=1)    # [window, chunk]
    out_ref[...] += jnp.dot(onehot, msgs_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("num_windows", "window", "interpret",
                                    "precision"))
def _scatter_matmul(win, local_rows, msgs, num_windows: int,
                    window: int = WINDOW,
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
        out_specs=pl.BlockSpec((window, f), lambda i, win: (win[i], 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel, window=window, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_windows * window, f),
                                       jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * chunk * window * f,
            bytes_accessed=msgs.size * 4 + num_windows * window * f * 4,
            transcendentals=0,
        ),
        # fused template paths push msgs past 128 lanes (up to 256);
        # only then raise the scoped-VMEM cap like the dual-backward
        # kernels (an unconditional bump measurably slowed the streamed
        # giant-graph geometry: Mosaic schedules differently under the
        # larger budget)
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if f > 128 else None),
        interpret=interpret,
    )(win, local_rows, msgs)


def _kernel_accum(win_ref, lr_ref, msgs_ref, out_in_ref, out_ref, *,
                  window, precision):
    """_kernel, but each window's accumulation starts from the aliased
    prior buffer contents instead of zero — lets streamed blocks write
    straight into one shared output (windows never straddle blocks)."""
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = out_in_ref[...]

    rows = jax.lax.broadcasted_iota(jnp.int32, (window, SUB), 0)
    onehot = jnp.concatenate(
        [(rows == lr_ref[a][None, :]).astype(msgs_ref.dtype)
         for a in range(lr_ref.shape[0])], axis=1)
    out_ref[...] += jnp.dot(onehot, msgs_ref[...],
                            preferred_element_type=jnp.float32,
                            precision=precision)


@functools.partial(jax.jit,
                   static_argnames=("window", "interpret", "precision"))
def _scatter_accum(win, local_rows, msgs, out, window: int = WINDOW,
                   interpret: bool = False,
                   precision=jax.lax.Precision.HIGHEST):
    """Accumulate one plan-ordered chunk stream into ``out`` in place
    (input_output_aliases).  ``win`` holds GLOBAL window ids."""
    num_chunks = win.shape[0]
    f = msgs.shape[1]
    sub_per_chunk = local_rows.shape[0] // num_chunks
    chunk = sub_per_chunk * SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((chunk, f), lambda i, win: (i, 0)),
            pl.BlockSpec((window, f), lambda i, win: (win[i], 0)),
        ],
        out_specs=pl.BlockSpec((window, f), lambda i, win: (win[i], 0)),
    )
    return pl.pallas_call(
        functools.partial(_kernel_accum, window=window, precision=precision),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, jnp.float32),
        input_output_aliases={3: 0},
        cost_estimate=pl.CostEstimate(
            flops=2 * num_chunks * chunk * window * f,
            bytes_accessed=msgs.size * msgs.dtype.itemsize
                           + num_chunks * window * f * 8,
            transcendentals=0,
        ),
        compiler_params=(pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024) if f > 128 else None),
        interpret=interpret,
    )(win, local_rows, msgs, out)


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
    if msgs.dtype not in (jnp.float32, jnp.bfloat16):
        msgs = msgs.astype(jnp.float32)
    out = _scatter_matmul(plan.win, plan.local_rows,
                          msgs, plan.num_windows,
                          window=plan.window,
                          interpret=jax.default_backend() != "tpu",
                          precision=_kernel_precision(
                              msgs.dtype, get_matmul_precision()))
    # zero the windows no chunk wrote (their buffers are uninitialized)
    mask = jnp.repeat(plan.visited, plan.window)[: plan.num_rows]
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


def _dual_bwd_math(lr_ref, va_ref, vb_ref, wa_ref, wb_ref, ge_ref, x_ref,
                   *, window, fa, precision):
    """Fused trainable-dual backward math: scatter + SDDMM off one one-hot.

    Per chunk (plan order; padding edges have an all-zero one-hot column
    and zero w) computes the increments

        d_out[window] = onehot @ (ge * valsel)        (d x of the apply)
        d_acc[1, 2F]  = sum_e x[row_e] * ge[e] * wsel  (d q partials)

    where valsel/wsel select the a/b lane halves.  The dq contraction is
    regrouped by destination row — sum_e x[row_e]*(ge*wsel)[e] =
    sum_row x[row] * scatter(ge*wsel)[row] — so both results ride ONE
    one-hot MXU dot of width 2*f2 (full 128-lane utilization at f2 = 64,
    where two separate f2-wide dots each waste half the systolic array),
    followed by a [window, f2] multiply with the resident x block.  The
    whole trainable backward thus costs one row gather (the caller's
    ge = g[col]) plus one full-width MXU pass — at f2 <= 64 the same MXU
    cycles as the frozen backward's half-width pass.  Wider f2 falls back
    to two dots (a fused dot would need > 256 lanes).

    Precision note: with a bf16 message dtype the fused dot rounds the
    per-edge dq products (ge*wsel) to bf16 before the one-hot
    contraction; accumulation stays f32 (preferred_element_type).  This
    matches the forward's bf16 message rounding.  Keeping the wsel half
    f32 would force a second MXU pass and defeat the fusion — if exact
    f32 dq is required, use f32 messages (set_message_dtype("f32")),
    under which the whole contraction is f32 end to end.
    """
    rows = jax.lax.broadcasted_iota(jnp.int32, (window, SUB), 0)
    onehot = jnp.concatenate(
        [(rows == lr_ref[a][None, :]).astype(ge_ref.dtype)
         for a in range(lr_ref.shape[0])], axis=1)    # [window, chunk]
    f2 = ge_ref.shape[1]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (SUB, f2), 1)
    valsel = jnp.concatenate(
        [jnp.where(lanes < fa, va_ref[a][:, None], vb_ref[a][:, None])
         for a in range(va_ref.shape[0])], axis=0)    # [chunk, 2F]
    wsel = jnp.concatenate(
        [jnp.where(lanes < fa, wa_ref[a][:, None], wb_ref[a][:, None])
         for a in range(wa_ref.shape[0])], axis=0)
    ge = ge_ref[...].astype(jnp.float32)
    x_win = x_ref[...].astype(jnp.float32)
    if f2 <= 128:
        both = jnp.concatenate(
            [ge * valsel, ge * wsel], axis=1).astype(ge_ref.dtype)
        r = jnp.dot(onehot, both, preferred_element_type=jnp.float32,
                    precision=precision)               # [window, 2*f2]
        return r[:, :f2], jnp.sum(x_win * r[:, f2:], axis=0,
                                  keepdims=True)
    msgs = (ge * valsel).astype(ge_ref.dtype)
    d_out = jnp.dot(onehot, msgs, preferred_element_type=jnp.float32,
                    precision=precision)
    dqm = jnp.dot(onehot, (ge * wsel).astype(ge_ref.dtype),
                  preferred_element_type=jnp.float32, precision=precision)
    return d_out, jnp.sum(x_win * dqm, axis=0, keepdims=True)


def _dual_bwd_kernel(win_ref, lr_ref, va_ref, vb_ref, wa_ref, wb_ref,
                     ge_ref, x_ref, out_ref, acc_ref, *, window, fa,
                     precision):
    """Fused trainable-dual backward step (see _dual_bwd_math)."""
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    d_out, d_acc = _dual_bwd_math(lr_ref, va_ref, vb_ref, wa_ref, wb_ref,
                                  ge_ref, x_ref, window=window, fa=fa,
                                  precision=precision)
    out_ref[...] += d_out
    acc_ref[...] += d_acc


@functools.partial(jax.jit,
                   static_argnames=("num_windows", "window", "fa",
                                    "interpret", "precision"))
def _dual_bwd_matmul(win, local_rows, va, vb, wa, wb, ge, x_pad,
                     num_windows: int, window: int, fa: int,
                     interpret: bool = False,
                     precision=jax.lax.Precision.HIGHEST):
    num_chunks = win.shape[0]
    f2 = ge.shape[1]
    sub_per_chunk = local_rows.shape[0] // num_chunks
    chunk = sub_per_chunk * SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((chunk, f2), lambda i, win: (i, 0)),
            pl.BlockSpec((window, f2), lambda i, win: (win[i], 0)),
        ],
        out_specs=[
            pl.BlockSpec((window, f2), lambda i, win: (win[i], 0)),
            pl.BlockSpec((1, f2), lambda i, win: (0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dual_bwd_kernel, window=window, fa=fa,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((num_windows * window, f2), jnp.float32),
            jax.ShapeDtypeStruct((1, f2), jnp.float32),
        ],
        # the fused scatter+SDDMM working set (one-hot + 2F-wide message
        # block + value selections) exceeds Mosaic's 16MB default scoped
        # budget at the large-window geometries; v5e has 128MB VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * num_chunks * chunk * window * f2,
            bytes_accessed=2 * ge.size * ge.dtype.itemsize
                           + num_chunks * window * f2 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win, local_rows, va, vb, wa, wb, ge, x_pad)


def dual_scatter_sddmm(plan: ScatterPlan, ge: jnp.ndarray, va, vb, wa, wb,
                       x: jnp.ndarray, fa: int):
    """(scatter_sum(plan, ge * valsel), SDDMM lane partials).

    One fused pallas pass for the trainable dual backward: ``ge`` is the
    plan-ordered gathered cotangent [E2, 2F]; ``va``/``vb`` the operator
    values, ``wa``/``wb`` the d(value)/dparam weights ([E2], plan order);
    ``x`` the [num_rows, 2F] table indexed by the plan's rows.  Returns
    (out [num_rows, 2F], partials [2F]) — sum the partials for dparam.
    """
    from ..spmm import get_matmul_precision

    f2 = ge.shape[1]
    nwin = plan.num_windows * plan.window
    x_pad = jnp.pad(x, ((0, nwin - x.shape[0]), (0, 0)))
    out, acc = _dual_bwd_matmul(
        plan.win, plan.local_rows,
        va.reshape(-1, SUB).astype(jnp.float32),
        vb.reshape(-1, SUB).astype(jnp.float32),
        wa.reshape(-1, SUB).astype(jnp.float32),
        wb.reshape(-1, SUB).astype(jnp.float32),
        ge, x_pad, plan.num_windows, window=plan.window, fa=fa,
        interpret=jax.default_backend() != "tpu",
        precision=_kernel_precision(ge.dtype, get_matmul_precision()))
    mask = jnp.repeat(plan.visited, plan.window)[: plan.num_rows]
    out = jnp.where(mask[:, None], out[: plan.num_rows, :f2], 0.0)
    return out, acc[0]


def _dual_bwd_kernel_accum(win_ref, lr_ref, va_ref, vb_ref, wa_ref, wb_ref,
                           ge_ref, x_ref, out_in_ref, acc_in_ref,
                           out_ref, acc_ref, *, window, fa, precision):
    """_dual_bwd_kernel with streamed-block aliasing: a window's first
    chunk within the block seeds from the aliased prior output buffer
    (windows never straddle blocks, same contract as _kernel_accum), and
    the SDDMM partials seed from the aliased prior accumulator — so
    consecutive blocks of a stream plan accumulate both results in
    place."""
    i = pl.program_id(0)
    prev = win_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, win_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = out_in_ref[...]

    @pl.when(i == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]

    d_out, d_acc = _dual_bwd_math(lr_ref, va_ref, vb_ref, wa_ref, wb_ref,
                                  ge_ref, x_ref, window=window, fa=fa,
                                  precision=precision)
    out_ref[...] += d_out
    acc_ref[...] += d_acc


@functools.partial(jax.jit,
                   static_argnames=("window", "fa", "interpret",
                                    "precision"))
def _dual_bwd_accum(win, local_rows, va, vb, wa, wb, ge, x_pad, out, acc,
                    window: int, fa: int, interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST):
    """One stream block of the fused trainable-dual backward, accumulated
    in place into (out, acc) via input_output_aliases.  ``win`` holds
    GLOBAL window ids."""
    num_chunks = win.shape[0]
    f2 = ge.shape[1]
    sub_per_chunk = local_rows.shape[0] // num_chunks
    chunk = sub_per_chunk * SUB
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((sub_per_chunk, SUB), lambda i, win: (i, 0)),
            pl.BlockSpec((chunk, f2), lambda i, win: (i, 0)),
            pl.BlockSpec((window, f2), lambda i, win: (win[i], 0)),
            pl.BlockSpec((window, f2), lambda i, win: (win[i], 0)),
            pl.BlockSpec((1, f2), lambda i, win: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((window, f2), lambda i, win: (win[i], 0)),
            pl.BlockSpec((1, f2), lambda i, win: (0, 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_dual_bwd_kernel_accum, window=window, fa=fa,
                          precision=precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(out.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, f2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        input_output_aliases={8: 0, 9: 1},
        cost_estimate=pl.CostEstimate(
            flops=4 * num_chunks * chunk * window * f2,
            bytes_accessed=2 * ge.size * ge.dtype.itemsize
                           + num_chunks * window * f2 * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(win, local_rows, va, vb, wa, wb, ge, x_pad, out, acc)


def streamed_dual_scatter_sddmm(stream: StreamPlan, col_blocks, make_terms,
                                g, x: jnp.ndarray, fa: int, g_hot=None):
    """Streamed fused trainable-dual backward (see dual_scatter_sddmm).

    lax.scan over the stream's blocks; ``make_terms(ge_block, i)`` maps the
    gathered cotangent block (``g_hot[col_blocks[i]]`` for the leading
    ``stream.hot_blocks`` blocks of a col-split layout, ``g[col_blocks[i]]``
    otherwise) to ``(ge, va, vb, wa, wb)`` — the per-edge message
    cotangent, operator values, and d(value)/dparam weights for block
    ``i``, all in block plan order ([E_blk] / [E_blk, 2F]).  Returns
    (dx [num_rows, 2F], partials [2F]); both accumulate in place across
    blocks through the aliased pallas outputs, so peak per-edge memory
    stays one block.
    """
    from ..spmm import get_matmul_precision

    window = stream.window
    interpret = jax.default_backend() != "tpu"
    s = stream.win.shape[0]
    hb = stream.hot_blocks
    if hb and g_hot is None:
        raise ValueError("col-split stream needs g_hot (gather g[hot_ids] "
                         "before calling)")
    f2 = g.shape[1]
    nwin = stream.num_windows * window
    x_pad = jnp.pad(x, ((0, nwin - x.shape[0]), (0, 0)))
    precision = get_matmul_precision()

    def section(carry, lo, hi, src):
        def body(carry, blk):
            out, acc = carry
            i, win, lr, col = blk
            ge, va, vb, wa, wb = make_terms(src[col], i)
            if ge.dtype not in (jnp.float32, jnp.bfloat16):
                ge = ge.astype(jnp.float32)
            out, acc = _dual_bwd_accum(
                win, lr,
                va.reshape(-1, SUB).astype(jnp.float32),
                vb.reshape(-1, SUB).astype(jnp.float32),
                wa.reshape(-1, SUB).astype(jnp.float32),
                wb.reshape(-1, SUB).astype(jnp.float32),
                ge, x_pad, out, acc, window=window, fa=fa,
                interpret=interpret,
                precision=_kernel_precision(ge.dtype, precision))
            return (out, acc), None

        carry, _ = jax.lax.scan(
            body, carry,
            (jnp.arange(lo, hi), stream.win[lo:hi],
             stream.local_rows[lo:hi], col_blocks[lo:hi]))
        return carry

    carry = (jnp.zeros((nwin, f2), jnp.float32),
             jnp.zeros((1, f2), jnp.float32))
    if hb:
        carry = section(carry, 0, hb, g_hot)
    if hb < s:
        carry = section(carry, hb, s, g)
    out, acc = carry
    mask = jnp.repeat(stream.visited, window)[: stream.num_rows]
    return jnp.where(mask[:, None], out[: stream.num_rows], 0.0), acc[0]


def split_dual_scatter_sddmm(plan: ScatterPlan, ge_hot, ge_cold,
                             va, vb, wa, wb, x: jnp.ndarray, fa: int):
    """Col-split flat variant of dual_scatter_sddmm: two aliased fused
    passes (the leading hot chunks, then the cold chunks) accumulate into
    one (out, acc).  A window revisited by the second section seeds from
    the prior buffer, same contract as split_scatter_accum.  ``ge_hot`` /
    ``ge_cold`` are the gathered cotangent sections ([he, 2F] from
    g[hot_ids], [E2-he, 2F] from g); ``va``..``wb`` full plan-order [E2].
    """
    from ..spmm import get_matmul_precision

    f2 = (ge_cold if ge_cold is not None else ge_hot).shape[1]
    nwin = plan.num_windows * plan.window
    x_pad = jnp.pad(x, ((0, nwin - x.shape[0]), (0, 0)))
    num_chunks = plan.win.shape[0]
    sub = plan.local_rows.shape[0] // num_chunks
    chunk = sub * SUB
    hc = plan.hot_chunks
    he = hc * chunk
    interpret = jax.default_backend() != "tpu"
    precision = get_matmul_precision()
    out = jnp.zeros((nwin, f2), jnp.float32)
    acc = jnp.zeros((1, f2), jnp.float32)
    for (c0, c1, e0, e1, ge) in (
            (0, hc, 0, he, ge_hot),
            (hc, num_chunks, he, num_chunks * chunk, ge_cold)):
        if c1 == c0:
            continue
        if ge.dtype not in (jnp.float32, jnp.bfloat16):
            ge = ge.astype(jnp.float32)
        out, acc = _dual_bwd_accum(
            plan.win[c0:c1], plan.local_rows[c0 * sub:c1 * sub],
            va[e0:e1].reshape(-1, SUB).astype(jnp.float32),
            vb[e0:e1].reshape(-1, SUB).astype(jnp.float32),
            wa[e0:e1].reshape(-1, SUB).astype(jnp.float32),
            wb[e0:e1].reshape(-1, SUB).astype(jnp.float32),
            ge, x_pad, out, acc, window=plan.window, fa=fa,
            interpret=interpret,
            precision=_kernel_precision(ge.dtype, precision))
    mask = jnp.repeat(plan.visited, plan.window)[: plan.num_rows]
    return jnp.where(mask[:, None], out[: plan.num_rows], 0.0), acc[0]


# Plans whose PADDED edge count (the flat plan layout, chunk padding
# included — what actually gets gathered and scattered) exceeds this
# execute in streamed blocks: one [E, f<=128] f32 message array costs
# E x 512 bytes of HBM (lane-tile padding), which exceeds the chip's HBM
# near E ~ 30M.  Builders construct the host plan first and compare its
# padded size, so the bound holds regardless of padding inflation.
STREAM_THRESHOLD_EDGES = 8_000_000
STREAM_BLOCK_EDGES = 4_000_000


@struct.dataclass
class MXUCoo:
    """COO in plan order + the scatter plan: A @ x via XLA gather + MXU
    scatter.  ``transposed`` (same structure for A^T) makes the backward a
    forward pass of the transpose instead of an unsorted XLA scatter.

    Exactly one of ``plan`` (flat) / ``stream`` (blocked col/val of shape
    [S, edges_per_block]) is set."""

    plan: Optional[ScatterPlan]
    col: jnp.ndarray   # [E2] int32 (0 for padding), or [S, E_blk]
    val: jnp.ndarray   # [E2] float (0 for padding), or [S, E_blk]
    num_cols: int = struct.field(pytree_node=False)
    transposed: object = None  # Optional[MXUCoo]
    stream: Optional[StreamPlan] = None
    # col-split layouts: hot edges' col ids index x[hot_ids] (see
    # col_degree_split); None = unsplit
    hot_ids: Optional[jnp.ndarray] = None

    @property
    def num_rows(self) -> int:
        return (self.plan or self.stream).num_rows


def mxu_from_coo(A, with_transpose: bool = True,
                 stream_threshold: Optional[int] = None,
                 stream_block_edges: Optional[int] = None) -> MXUCoo:
    """Build from ops.coo.COO (valid entries only).

    ``stream_threshold`` / ``stream_block_edges`` default to the
    module-level knobs AT CALL TIME (a def-time default would freeze
    them, making runtime knob overrides silently ineffective here while
    dual_propagator honored them)."""
    if stream_threshold is None:
        stream_threshold = STREAM_THRESHOLD_EDGES
    if stream_block_edges is None:
        stream_block_edges = STREAM_BLOCK_EDGES
    row = np.asarray(A.row)[: A.nnz]
    col = np.asarray(A.col)[: A.nnz]
    val = np.asarray(A.val)[: A.nnz]

    def build(r, c, n_rows, n_cols, t):
        split = col_degree_split(c, n_cols)
        grp, hot_ids = None, None
        if split is not None:
            grp, c, hot_ids = split
            hot_ids = jnp.asarray(hot_ids)
        h = _build_plan_host(r, n_rows, group=grp)
        if len(h["perm"]) > stream_threshold:   # padded plan size
            stream, perm = _stream_from_host(h, stream_block_edges)
            c_p, v_p = permute_edge_data(perm, np.asarray(c, np.int32),
                                         val.astype(np.float32))
            s = stream.win.shape[0]
            return MXUCoo(plan=None, col=jnp.asarray(c_p).reshape(s, -1),
                          val=jnp.asarray(v_p).reshape(s, -1),
                          num_cols=n_cols, transposed=t, stream=stream,
                          hot_ids=hot_ids)
        plan, perm = _plan_from_host(h)
        c_p, v_p = permute_edge_data(perm, np.asarray(c, np.int32),
                                     val.astype(np.float32))
        return MXUCoo(plan=plan, col=jnp.asarray(c_p), val=jnp.asarray(v_p),
                      num_cols=n_cols, transposed=t, hot_ids=hot_ids)

    t = build(col, row, A.num_cols, A.num_nodes, None)         if with_transpose else None
    return build(row, col, A.num_nodes, A.num_cols, t)


@jax.custom_vjp
def mxu_spmm(A: MXUCoo, x: jnp.ndarray) -> jnp.ndarray:
    return _mxu_forward(A, x)


def _mxu_forward(A, x):
    from ..spmm import get_matmul_precision, get_message_dtype

    mdt = get_message_dtype() or x.dtype
    # gather straight from a message-dtype table: bf16 rows halve the
    # gather's read traffic and measure ~15% faster on v5e
    xg = x.astype(mdt)
    x_hot = xg[A.hot_ids] if A.hot_ids is not None else None
    if A.stream is not None:
        out = streamed_scatter(
            A.stream, A.col,
            lambda g, i: (A.val[i][:, None] * g).astype(mdt),
            xg, x.shape[1], get_matmul_precision(), x_hot=x_hot)
        return out.astype(x.dtype)
    if x_hot is not None:
        out = split_scatter_accum(
            A.plan, A.col,
            lambda g, lo, hi: (A.val[lo:hi][:, None] * g).astype(mdt),
            xg, x_hot, x.shape[1], get_matmul_precision())
        return out.astype(x.dtype)
    msgs = (A.val[:, None] * xg[A.col]).astype(mdt)
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
