"""Multi-chip attention tier: sharded softmax-by-destination aggregation.

The attention family (SNEA / SiGAT / SDGNN, nn/signed/snea_conv.AttnGraph)
aggregates per-edge messages weighted by a softmax over edges grouped by
destination.  Because every destination's edges live on exactly one device
under an owner-computes row partition, the softmax needs NO communication:

  * Host-side, the AttnGraph's valid edges are split by destination-row
    owner (device d owns rows [d*rows_per, (d+1)*rows_per), the same
    partition as parallel.mxu_shard) and an MXU scatter plan is built per
    device over LOCAL rows with one common (window, chunk) geometry.
  * Inside shard_map, each device gathers endpoint features from the
    replicated activations (closure-captured, lifted as replicated
    operands), evaluates the model's per-edge logits/messages callback,
    and runs the fused [denominator | weighted msgs] scatter on its own
    plan — one Pallas kernel per device, zero collectives for the
    aggregation itself.  The one collective per apply is the tiled
    all-gather that re-replicates the row-sharded output over ICI.
  * Backward flows through jax.grad: shard_map transposes the all-gather
    to a reduce-scatter and psums the captured activations' cotangents;
    the scatter's custom VJP (a row gather) runs per device.

No reference counterpart — the reference's PyG ``softmax(alpha, index)``
(nn/signed/SNEAConv.py:143) is single-device; this is the scaling story
for the attention tier (SURVEY.md §2.7).
"""
from __future__ import annotations

import functools
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map
from flax import struct

from ..ops.pallas.scatter_mxu import (
    SUB,
    ScatterPlan,
    _build_plan_host,
    _pick_geometry,
    permute_edge_data,
    scatter_sum,
)


@struct.dataclass
class ShardedAttnGraph:
    """Per-device attention-edge plans stacked on a leading device axis.

    src/dst are GLOBAL node ids (dst == num_nodes marks padding);
    global_rows holds LOCAL destination rows (rows_per_device marks
    padding) for the scatter VJP's row gather.
    """

    src: jnp.ndarray          # [D, E2] int32
    dst: jnp.ndarray          # [D, E2] int32 (num_nodes = padding)
    edge_p: jnp.ndarray       # [D, E2] int32 edge-type selector
    win: jnp.ndarray          # [D, C] int32 LOCAL window ids
    local_rows: jnp.ndarray   # [D, C * chunk/SUB, SUB] int32
    global_rows: jnp.ndarray  # [D, E2] int32 LOCAL rows, rows_per padding
    visited: jnp.ndarray      # [D, num_windows] bool
    num_nodes: int = struct.field(pytree_node=False)
    rows_per_device: int = struct.field(pytree_node=False)
    num_windows: int = struct.field(pytree_node=False)
    window: int = struct.field(pytree_node=False)
    n_devices: int = struct.field(pytree_node=False)
    mesh: Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)


def shard_attention_graph(g, mesh: Mesh,
                          axis: str = "graph") -> ShardedAttnGraph:
    """Re-partition a built AttnGraph across ``axis`` (host-side).

    Valid edges are recovered from the flat plan order (dst < num_nodes),
    re-owned by destination row block, and re-planned per device with one
    shared (window, chunk) geometry so the stacked plans run one kernel.
    """
    n = g.num_nodes
    n_dev = mesh.shape[axis]
    dst_all = np.asarray(g.dst)
    valid = dst_all < n
    src = np.asarray(g.src)[valid].astype(np.int64)
    dst = dst_all[valid].astype(np.int64)
    ep = np.asarray(g.edge_p)[valid].astype(np.int32)

    rows_per = -(-max(n, 1) // n_dev)
    owner = dst // rows_per if len(dst) else dst
    local = dst - owner * rows_per

    o = np.argsort(local, kind="stable")
    window, chunk = _pick_geometry(local[o], rows_per, None)
    sub = chunk // SUB

    masks = [owner == d for d in range(n_dev)]
    hs = [_build_plan_host(local[m], rows_per, chunk=chunk, window=window)
          for m in masks]
    nw = hs[0]["num_windows"]
    c_max = max(max(len(h["win"]) for h in hs), 1)
    e2 = c_max * chunk

    win_s = np.zeros((n_dev, c_max), np.int32)
    lr_s = np.full((n_dev, c_max * sub, SUB), window, np.int32)
    gr_s = np.full((n_dev, e2), rows_per, np.int32)
    vis_s = np.zeros((n_dev, nw), bool)
    src_s = np.zeros((n_dev, e2), np.int32)
    dst_s = np.full((n_dev, e2), n, np.int32)
    ep_s = np.zeros((n_dev, e2), np.int32)
    for d, (h, m) in enumerate(zip(hs, masks)):
        c = len(h["win"])
        if c == 0:
            # edgeless shard: win 0 + all-padding rows writes nothing and
            # visited stays all-False, so the output mask zeroes the block
            continue
        p = h["perm"]
        win_s[d, :c] = h["win"]
        # trailing dummy chunks revisit the last window so the kernel's
        # zero-on-first-visit logic never re-clears a written buffer
        win_s[d, c:] = h["win"][-1]
        lr_s[d, : c * sub] = h["lr"].reshape(-1, SUB)
        gr_s[d, : c * chunk] = h["gr"]
        vis_s[d] = h["visited"]
        ps, pe = permute_edge_data(p, src[m].astype(np.int32), ep[m])
        src_s[d, : c * chunk] = ps
        ep_s[d, : c * chunk] = pe
        pd = np.full(len(p), n, np.int32)
        pd[p >= 0] = dst[m][p[p >= 0]].astype(np.int32)
        dst_s[d, : c * chunk] = pd

    def put(a, spec):
        return jax.device_put(jnp.asarray(a), NamedSharding(mesh, spec))

    return ShardedAttnGraph(
        src=put(src_s, P(axis, None)),
        dst=put(dst_s, P(axis, None)),
        edge_p=put(ep_s, P(axis, None)),
        win=put(win_s, P(axis, None)),
        local_rows=put(lr_s, P(axis, None, None)),
        global_rows=put(gr_s, P(axis, None)),
        visited=put(vis_s, P(axis, None)),
        num_nodes=n, rows_per_device=rows_per, num_windows=nw,
        window=window, n_devices=n_dev, mesh=mesh, axis=axis,
    )


def sharded_attention_apply(
    sg: ShardedAttnGraph,
    edge_fn: Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                      Tuple[jnp.ndarray, jnp.ndarray]],
) -> jnp.ndarray:
    """softmax-by-destination aggregation of edge_fn's messages, sharded.

    ``edge_fn(src, dst, edge_p, valid) -> (logits [E2], msgs [E2, F])``
    runs INSIDE shard_map on this device's plan-ordered edge arrays
    (src/dst pre-clamped to valid node ids); node activations and model
    parameters enter by closure and are lifted as replicated operands, so
    their gradients come back psum'd across the mesh.  Differentiable.

    The softmax shift is the device-local max over valid logits — segment
    softmax is invariant to any constant shift, so this matches the
    single-device global-shift result up to float rounding.
    """
    n = sg.num_nodes
    axis = sg.axis
    rows_per, nw, window = sg.rows_per_device, sg.num_windows, sg.window
    e2 = sg.src.shape[1]

    @functools.partial(
        shard_map, mesh=sg.mesh,
        in_specs=(P(axis, None), P(axis, None, None), P(axis, None),
                  P(axis, None), P(axis, None), P(axis, None),
                  P(axis, None)),
        out_specs=P(None, None), check_vma=False)
    def run(win, lr, gr, vis, src, dst, ep):
        win, lr, gr, vis = win[0], lr[0], gr[0], vis[0]
        src, dst, ep = src[0], dst[0], ep[0]
        valid = dst < n
        logits, msgs = edge_fn(jnp.minimum(src, n - 1),
                               jnp.minimum(dst, n - 1), ep, valid)
        neg_inf = jnp.finfo(logits.dtype).min
        shift = jnp.max(jnp.where(valid, logits, neg_inf))
        shift = jnp.where(jnp.isfinite(shift), shift, 0.0)
        ex = jnp.where(valid, jnp.exp(logits - shift), 0.0)
        stacked = jnp.concatenate([ex[:, None], msgs * ex[:, None]], axis=1)
        plan = ScatterPlan(local_rows=lr, global_rows=gr, win=win,
                           visited=vis, num_rows=rows_per, num_windows=nw,
                           num_edges=e2, window=window)
        agg = scatter_sum(plan, stacked)
        denom = jnp.maximum(agg[:, :1], jnp.finfo(logits.dtype).tiny)
        return jax.lax.all_gather(agg[:, 1:] / denom, axis, axis=0,
                                  tiled=True)

    out = run(sg.win, sg.local_rows, sg.global_rows, sg.visited,
              sg.src, sg.dst, sg.edge_p)
    return out[:n]


def shard_attention_graphs(graphs, mesh: Mesh, axis: str = "graph"):
    """Shard every AttnGraph in a model's graph tuple/list (e.g. the
    (g_pos, g_neg, g_cat) of snea_graphs or SiGAT/SDGNN motif lists)."""
    out = [shard_attention_graph(g, mesh, axis) for g in graphs]
    return tuple(out) if isinstance(graphs, tuple) else out
