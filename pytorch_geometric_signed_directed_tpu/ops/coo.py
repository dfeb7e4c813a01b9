"""Static-shape COO sparse adjacency pytree — the core graph container.

TPU-first design notes
----------------------
XLA compiles one program per shape, so the edge list is padded to a static
size and *sorted by destination row*.  Padding entries use ``row == num_nodes``
(an out-of-range segment id): ``jax.ops.segment_sum`` silently drops
out-of-range indices, so padded edges contribute nothing and sortedness is
preserved, letting us pass ``indices_are_sorted=True`` for a faster scatter.

The reference library (PyG ``MessagePassing``, see
/root/reference/torch_geometric_signed_directed/nn/directed/MagNetConv.py:196)
re-dispatches a Python scatter per propagate call; here the adjacency is a
frozen pytree and the matvec is a pure function, so an entire model forward
jits into one XLA program.

Convention: an entry ``(row, col, val)`` means ``A[row, col] = val`` and
``spmm(A, x)[row] += val * x[col]`` — i.e. plain matrix multiplication.
This matches PyG's ``flow='target_to_source'`` propagate (out = L @ x) used
by the spectral convs; layers that aggregate in the opposite direction
simply build the transposed COO.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class COO:
    """Padded, row-sorted COO sparse matrix (a pytree; leaves are jnp arrays).

    Attributes:
        row: [E_pad] int32 destination (output) indices, sorted ascending.
             Padding entries hold ``num_nodes`` (dropped by segment ops).
        col: [E_pad] int32 source indices (0 for padding).
        val: [E_pad] float edge values (0 for padding).
        num_nodes: static number of rows (= cols for square adjacencies).
        num_cols: static number of columns.
        nnz: static count of valid (non-padding) edges.
    """

    row: jnp.ndarray
    col: jnp.ndarray
    val: jnp.ndarray
    num_nodes: int = struct.field(pytree_node=False)
    num_cols: int = struct.field(pytree_node=False)
    nnz: int = struct.field(pytree_node=False)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.num_nodes, self.num_cols)

    @property
    def num_edges(self) -> int:
        return self.nnz

    def transpose(self) -> "COO":
        """Host-side transpose (re-sorts; call outside jit)."""
        row = np.asarray(self.row)[: self.nnz]
        col = np.asarray(self.col)[: self.nnz]
        val = np.asarray(self.val)[: self.nnz]
        return build_coo(
            col, row, val, self.num_cols, num_cols=self.num_nodes,
            pad_to=len(self.row),
        )

    def to_dense(self) -> jnp.ndarray:
        """Dense [N, M] materialisation (device-side, jit-safe).

        The scatter-add always runs under jit: the eager dispatch path of
        at-least-one TPU runtime (tunneled v5e, libtpu 2026-xx) silently
        returns all-zeros for scatters into outputs beyond ~40 MB — jitted
        scatters are correct at every size we probed.  A host-side guard in
        ops.spmm.propagator_from_coo double-checks preprocessing builds.
        """
        dense = _scatter_dense(self.row, self.col, self.val,
                               (self.num_nodes + 1, self.num_cols))
        return dense[: self.num_nodes]

    def to_scipy(self):
        import scipy.sparse as sp

        r = np.asarray(self.row)[: self.nnz]
        c = np.asarray(self.col)[: self.nnz]
        v = np.asarray(self.val)[: self.nnz]
        return sp.coo_matrix((v, (r, c)), shape=self.shape).tocsr()


@functools.partial(jax.jit, static_argnames=("shape",))
def _scatter_dense(row, col, val, shape):
    return jnp.zeros(shape, val.dtype).at[row, col].add(val)


def _is_rowcol_sorted(row: np.ndarray, col: np.ndarray) -> bool:
    """O(n) check saving the O(n log n) lexsort for pre-coalesced inputs
    (most propagator builds feed coalesce_edges output straight in)."""
    if len(row) < 2:
        return True
    r0, r1 = row[:-1], row[1:]
    return bool(np.all((r1 > r0) | ((r1 == r0) & (col[1:] >= col[:-1]))))


def build_coo(
    row,
    col,
    val=None,
    num_nodes: Optional[int] = None,
    *,
    num_cols: Optional[int] = None,
    pad_to: Optional[int] = None,
    pad_multiple: int = 8,
    dtype=np.float32,
    sum_duplicates: bool = False,
) -> COO:
    """Host-side constructor: sorts by (row, col), pads, wraps in a pytree.

    Args:
        row/col: int arrays of destination / source indices.
        val: optional edge values (defaults to ones).
        num_nodes: number of rows; inferred as max index + 1 if omitted.
        num_cols: number of columns (defaults to num_nodes).
        pad_to: explicit padded length; otherwise rounded up to pad_multiple.
        sum_duplicates: coalesce duplicate (row, col) pairs by summing.
    """
    row = np.asarray(row, dtype=np.int64).ravel()
    col = np.asarray(col, dtype=np.int64).ravel()
    if val is None:
        val = np.ones(len(row), dtype=dtype)
    else:
        val = np.asarray(val, dtype=dtype).ravel()
    if num_nodes is None:
        num_nodes = int(max(row.max(initial=-1), col.max(initial=-1)) + 1)
    if num_cols is None:
        num_cols = num_nodes

    if sum_duplicates and len(row):
        from .coalesce import coalesce_edges

        row, col, sval = coalesce_edges(row, col, val, num_cols=num_cols)
        val = sval.astype(val.dtype)
    elif len(row) and not _is_rowcol_sorted(row, col):
        order = np.lexsort((col, row))
        row, col, val = row[order], col[order], val[order]

    nnz = len(row)
    e_pad = pad_to if pad_to is not None else max(_round_up(max(nnz, 1), pad_multiple), pad_multiple)
    if e_pad < nnz:
        raise ValueError(f"pad_to={e_pad} < nnz={nnz}")
    prow = np.full(e_pad, num_nodes, dtype=np.int32)
    pcol = np.zeros(e_pad, dtype=np.int32)
    pval = np.zeros(e_pad, dtype=dtype)
    prow[:nnz] = row
    pcol[:nnz] = col
    pval[:nnz] = val
    return COO(
        row=jnp.asarray(prow),
        col=jnp.asarray(pcol),
        val=jnp.asarray(pval),
        num_nodes=int(num_nodes),
        num_cols=int(num_cols),
        nnz=int(nnz),
    )


def coo_from_scipy(A, pad_to: Optional[int] = None, pad_multiple: int = 8) -> COO:
    A = A.tocoo()
    return build_coo(
        A.row, A.col, A.data, A.shape[0], num_cols=A.shape[1],
        pad_to=pad_to, pad_multiple=pad_multiple, dtype=A.data.dtype
        if A.data.dtype in (np.float32, np.float64) else np.float32,
    )
