"""Block-sparse-row SpMM as a Pallas TPU kernel.

The adjacency is stored as dense 128x128 sub-blocks (BSR).  The kernel grid
iterates (feature-tile, nonzero-block); scalar-prefetched block-row /
block-column id arrays drive the BlockSpec index maps, so the pipeline
DMA-fetches exactly the x-tile each adjacency block needs while the MXU
runs.  Consecutive grid steps landing in the same output row-block keep the
output tile resident in VMEM, giving CSR-style accumulation without any
scatter — the TPU answer to the reference's torch_scatter CUDA scatter-add
substrate (SURVEY.md §2.6; e.g. reference
torch_geometric_signed_directed/nn/directed/MagNetConv.py:196-240).

Use for graphs too large for the dense tier; for the small headline graphs
(cora_ml, telegram, bitcoin_otc) the dense-MXU tier wins (ops/spmm.py).
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

BLOCK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@struct.dataclass
class BSR:
    """Padded block-sparse-row matrix (128x128 dense blocks), a pytree.

    Every block-row of the padded matrix appears at least once in
    ``block_rows`` (empty rows get one zero block) so the kernel writes
    every output tile.

    Attributes:
        blocks: [NB, 128, 128] float32 dense sub-blocks, sorted by
            (block_row, block_col).
        block_rows: [NB] int32 block-row index per block (non-decreasing).
        block_cols: [NB] int32 block-col index per block.
        num_rows / num_cols: logical (unpadded) matrix dims.
        transposed: the same matrix in transposed BSR form (for the VJP).
    """

    blocks: jnp.ndarray
    block_rows: jnp.ndarray
    block_cols: jnp.ndarray
    num_rows: int = struct.field(pytree_node=False)
    num_cols: int = struct.field(pytree_node=False)
    transposed: Optional["BSR"] = None

    @property
    def padded_shape(self) -> Tuple[int, int]:
        return (_round_up(self.num_rows, BLOCK), _round_up(self.num_cols, BLOCK))


def _bsr_arrays(row, col, val, num_rows, num_cols):
    """Group COO entries into sorted 128x128 blocks, covering every row."""
    rb = _round_up(max(num_rows, 1), BLOCK) // BLOCK
    cb = _round_up(max(num_cols, 1), BLOCK) // BLOCK
    bid = (row // BLOCK) * cb + (col // BLOCK)
    uniq, inv = np.unique(bid, return_inverse=True)
    # One zero block for every block-row with no entries, so the kernel
    # initialises (zeroes) every output tile.
    missing_rows = np.setdiff1d(np.arange(rb), uniq // cb)
    all_bids = np.concatenate([uniq, missing_rows * cb]).astype(np.int64)
    order = np.argsort(all_bids, kind="stable")
    all_bids = all_bids[order]
    # Position of each original unique block after the merge-sort.
    pos_of_uniq = np.searchsorted(all_bids, uniq)
    nb = len(all_bids)
    blocks = np.zeros((nb, BLOCK, BLOCK), np.float32)
    np.add.at(blocks, (pos_of_uniq[inv], row % BLOCK, col % BLOCK), val)
    return blocks, (all_bids // cb).astype(np.int32), (all_bids % cb).astype(np.int32)


# Scalar-prefetch operands live in scoped SMEM (~1 MB); block id arrays
# must stay well under that, and the dense blocks must fit HBM.
_MAX_BLOCKS = 100_000


def bsr_from_coo(A, with_transpose: bool = True) -> BSR:
    """Host-side conversion from ops.coo.COO (uses only valid entries).

    BSR pays 128x128 dense work per touched block: it is only profitable
    when edges are concentrated (use ops.reorder.rcm_permutation /
    block_density to check).  Graphs whose edges touch more than
    ~100k blocks are rejected — use the segment tier there.
    """
    row = np.asarray(A.row)[: A.nnz].astype(np.int64)
    col = np.asarray(A.col)[: A.nnz].astype(np.int64)
    val = np.asarray(A.val)[: A.nnz].astype(np.float32)
    cb = _round_up(max(A.num_cols, 1), BLOCK) // BLOCK
    n_blocks = len(np.unique((row // BLOCK) * cb + (col // BLOCK)))
    if n_blocks > _MAX_BLOCKS:
        raise ValueError(
            f"graph touches {n_blocks} 128x128 blocks (> {_MAX_BLOCKS}); "
            "BSR would not fit on-chip resources — reorder the graph "
            "(ops.reorder) or use the segment tier")
    blocks, brows, bcols = _bsr_arrays(row, col, val, A.num_nodes, A.num_cols)
    t = None
    if with_transpose:
        tb, tr, tc = _bsr_arrays(col, row, val, A.num_cols, A.num_nodes)
        t = BSR(blocks=jnp.asarray(tb), block_rows=jnp.asarray(tr),
                block_cols=jnp.asarray(tc), num_rows=A.num_cols,
                num_cols=A.num_nodes, transposed=None)
    return BSR(blocks=jnp.asarray(blocks), block_rows=jnp.asarray(brows),
               block_cols=jnp.asarray(bcols), num_rows=A.num_nodes,
               num_cols=A.num_cols, transposed=t)


def _kernel(rows_ref, cols_ref, block_ref, x_ref, out_ref):
    i = pl.program_id(1)
    prev = rows_ref[jnp.maximum(i - 1, 0)]
    is_first = jnp.logical_or(i == 0, rows_ref[i] != prev)

    @pl.when(is_first)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jnp.dot(
        block_ref[0], x_ref[...], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(
    jax.jit, static_argnames=("n_row_blocks", "f_tile", "interpret")
)
def _bsr_matmul(blocks, block_rows, block_cols, x_pad, n_row_blocks: int,
                f_tile: int, interpret: bool = False):
    nb = blocks.shape[0]
    f_pad = x_pad.shape[1]
    num_f_tiles = f_pad // f_tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_f_tiles, nb),
        in_specs=[
            pl.BlockSpec((1, BLOCK, BLOCK), lambda ft, i, rows, cols: (i, 0, 0)),
            pl.BlockSpec((BLOCK, f_tile), lambda ft, i, rows, cols: (cols[i], ft)),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, f_tile), lambda ft, i, rows, cols: (rows[i], ft)
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_row_blocks * BLOCK, f_pad), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * BLOCK * BLOCK * f_pad,
            bytes_accessed=blocks.size * 4 + x_pad.size * 4
            + n_row_blocks * BLOCK * f_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(block_rows, block_cols, blocks, x_pad)


def _bsr_forward(A: BSR, x: jnp.ndarray) -> jnp.ndarray:
    import math

    rows_pad, cols_pad = A.padded_shape
    f = x.shape[1]
    f_pad = _round_up(max(f, BLOCK), BLOCK)
    f_tile = math.gcd(f_pad, 512)
    x_pad = jnp.zeros((cols_pad, f_pad), jnp.float32)
    x_pad = x_pad.at[: x.shape[0], :f].set(x.astype(jnp.float32))
    out = _bsr_matmul(A.blocks, A.block_rows, A.block_cols, x_pad,
                      n_row_blocks=rows_pad // BLOCK, f_tile=f_tile,
                      interpret=jax.default_backend() != "tpu")
    return out[: A.num_rows, :f].astype(x.dtype)


@jax.custom_vjp
def bsr_spmm(A: BSR, x: jnp.ndarray) -> jnp.ndarray:
    """``A @ x`` with x: [num_cols, F] → [num_rows, F]."""
    return _bsr_forward(A, x)


def _fwd(A, x):
    return _bsr_forward(A, x), A


def _zero_cotangent(A):
    def z(leaf):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, jax.dtypes.float0)

    return jax.tree.map(z, A)


def _bwd(A, g):
    if A.transposed is None:
        raise ValueError("BSR built with with_transpose=False is not differentiable")
    return _zero_cotangent(A), _bsr_forward(A.transposed, g)


bsr_spmm.defvjp(_fwd, _bwd)
