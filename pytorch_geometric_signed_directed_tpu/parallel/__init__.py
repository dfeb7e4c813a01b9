"""Multi-chip scaling: mesh utilities + sharded propagators.

The reference has no distributed layer at all (SURVEY.md §2.7); this module
is the TPU-native scaling story: graphs are partitioned over a
jax.sharding.Mesh (row/edge partition), XLA's GSPMD inserts the collectives
(all-gather of activations over ICI), and the same model code runs on one
chip via a trivial mesh.
"""

from .mesh import make_mesh, local_mesh
from .sharded import (
    replicate,
    shard_dual,
    shard_propagator,
    shard_magnet_laplacian,
)
from .edge_spmm import PartitionedCOO, partition_coo, place, sharded_spmm
from .mxu_shard import ShardedMXU, build_sharded_mxu, sharded_mxu_spmm
from .attn_shard import (
    ShardedAttnGraph,
    shard_attention_graph,
    shard_attention_graphs,
    sharded_attention_apply,
)

__all__ = [
    "ShardedAttnGraph",
    "shard_attention_graph",
    "shard_attention_graphs",
    "sharded_attention_apply",
    "ShardedMXU",
    "build_sharded_mxu",
    "sharded_mxu_spmm",
    "make_mesh",
    "local_mesh",
    "replicate",
    "shard_dual",
    "shard_propagator",
    "shard_magnet_laplacian",
    "PartitionedCOO",
    "partition_coo",
    "place",
    "sharded_spmm",
]
