"""Sharded propagators: row/edge-partitioned graph operators under GSPMD.

Partitioning scheme (the TPU answer to the absent distributed layer of the
reference, SURVEY.md §2.7):

  * dense tier — the [N, N] operator is sharded by rows across the mesh
    axis; features stay replicated.  Each device computes its row block on
    its MXU; XLA keeps the output row-sharded and all-gathers activations
    over ICI only where the next op needs them.
  * segment tier — the padded edge arrays are sharded on the edge
    dimension (edges are pre-sorted by destination row, so each shard owns
    a contiguous row range); XLA lowers the segment-sum to local partial
    sums + a cross-device reduce (scatter-add never crosses ICI more than
    once).

Because the Propagator is a pytree, sharding it is just placing its leaves
with NamedSharding — model code is unchanged, which is the point: one-chip
and pod-slice execution share every line above this file.
"""
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.coo import COO
from ..ops.spmm import Propagator


def replicate(tree, mesh: Mesh):
    """Place every leaf replicated over the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def _edge_sharding(mesh: Mesh, axis: str):
    return NamedSharding(mesh, P(axis))


def shard_propagator(prop: Propagator, mesh: Mesh,
                     axis: str = "graph") -> Propagator:
    """Shard a Propagator's operator storage across ``axis``."""
    if prop.mode == "dense":
        dense = jax.device_put(
            prop.dense, NamedSharding(mesh, P(axis, None)))
        return Propagator(coo=None, dense=dense, bsr=None, mode="dense")
    if prop.mode == "segment":
        es = _edge_sharding(mesh, axis)
        coo = COO(
            row=jax.device_put(prop.coo.row, es),
            col=jax.device_put(prop.coo.col, es),
            val=jax.device_put(prop.coo.val, es),
            num_nodes=prop.coo.num_nodes,
            num_cols=prop.coo.num_cols,
            nnz=prop.coo.nnz,
        )
        return Propagator(coo=coo, dense=None, bsr=None, mode="segment")
    if prop.mode == "mxu":
        # re-partition the flagship Pallas tier: per-device scatter plans
        # over the owner-computes row partition, kernel under shard_map
        from .mxu_shard import _coo_from_mxu, build_sharded_mxu

        row, col, val = _coo_from_mxu(prop.mxu)
        S = build_sharded_mxu(row, col, val, prop.mxu.num_rows,
                              prop.mxu.num_cols, mesh, axis)
        return Propagator(coo=None, dense=None, bsr=None, mxu=S,
                          mode="mxu_sharded")
    if prop.mode == "bsr":
        bsr = prop.bsr
        bs = NamedSharding(mesh, P(axis, None, None))
        es = _edge_sharding(mesh, axis)
        from ..ops.pallas.bsr_spmm import BSR

        def place(b):
            if b is None:
                return None
            return BSR(
                blocks=jax.device_put(b.blocks, bs),
                block_rows=jax.device_put(b.block_rows, es),
                block_cols=jax.device_put(b.block_cols, es),
                num_rows=b.num_rows, num_cols=b.num_cols,
                transposed=place(b.transposed),
            )

        return Propagator(coo=None, dense=None, bsr=place(bsr), mode="bsr")
    raise ValueError(prop.mode)


def shard_dual(dual, mesh: Mesh, axis: str = "graph"):
    """Shard a fused DualPropagator.

    mxu duals are re-partitioned into per-device scatter plans run under
    shard_map (parallel.mxu_shard); segment duals shard their sorted edge
    arrays under GSPMD."""
    from ..ops.spmm import DualPropagator

    if dual is None:
        return None
    if dual.mode == "mxu":
        from .mxu_shard import _coo_from_dual, build_sharded_mxu

        row, col, va, vb = _coo_from_dual(dual)
        S = build_sharded_mxu(row, col, va, dual.num_nodes, dual.num_cols,
                              mesh, axis, val_b=vb)

        def wrap(s):
            if s is None:
                return None
            return DualPropagator(
                col=None, row=None, val_a=None, val_b=None, plan=s,
                num_nodes=s.num_rows, num_cols=s.num_cols,
                mode="mxu_sharded", transposed=wrap(s.transposed))

        return wrap(S)
    if dual.mode != "segment":
        return None
    es = _edge_sharding(mesh, axis)

    def place(d):
        if d is None:
            return None
        return DualPropagator(
            col=jax.device_put(d.col, es),
            row=jax.device_put(d.row, es),
            val_a=jax.device_put(d.val_a, es),
            val_b=jax.device_put(d.val_b, es),
            plan=None, num_nodes=d.num_nodes, num_cols=d.num_cols,
            mode="segment", transposed=place(d.transposed))

    return place(dual)


def shard_magnet_laplacian(lap, mesh: Mesh, axis: str = "graph"):
    """Shard a MagneticPair / (P_re, P_im) pair / MagneticTemplate."""
    from ..spectral.magnetic import MagneticPair, MagneticTemplate

    if isinstance(lap, MagneticPair):
        return MagneticPair(
            re=shard_propagator(lap.re, mesh, axis),
            im=shard_propagator(lap.im, mesh, axis),
            dual=shard_dual(lap.dual, mesh, axis))
    if isinstance(lap, MagneticTemplate):
        if lap.mode == "dense":
            s = NamedSharding(mesh, P(axis, None))
            return MagneticTemplate(
                a_norm=jax.device_put(lap.a_norm, s),
                theta=jax.device_put(lap.theta, s),
                row=None, col=None, num_nodes=lap.num_nodes, mode="dense")
        if lap.mode == "mxu":
            # trainable q across the mesh: per-device plans carrying
            # (a_norm, theta); values rebuild in-shard for a traced q
            from .mxu_shard import build_sharded_template

            return build_sharded_template(lap, mesh, axis)
        if lap.mode == "mxu_sharded":
            return lap
        es = _edge_sharding(mesh, axis)
        return MagneticTemplate(
            a_norm=jax.device_put(lap.a_norm, es),
            theta=jax.device_put(lap.theta, es),
            row=jax.device_put(lap.row, es),
            col=jax.device_put(lap.col, es),
            num_nodes=lap.num_nodes, mode="segment")
    P_re, P_im = lap
    return (shard_propagator(P_re, mesh, axis),
            shard_propagator(P_im, mesh, axis))
