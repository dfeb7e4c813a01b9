"""pytorch_geometric_signed_directed_tpu — a TPU-native signed/directed GNN framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
SherylHYX/pytorch_geometric_signed_directed (reference mounted at
/root/reference): spectral complex-valued magnetic-Laplacian convolutions
(MagNet, MSGNN), PPR-based directed propagation (DiGCN, DGCN), signed
balance-theory convolutions (SGCN, SNEA), motif attention (SiGAT, SDGNN),
mixed-path aggregation clustering (DIGRAC, SSSNET), directed contrastive
learning (DiGCL), plus data containers, synthetic SBM generators, real-data
loaders, node/link splitting, task losses and evaluation helpers.

Architecture (TPU-first, bottom-up):

  ops/       static-shape COO/BSR sparse tier: XLA segment ops, dense-MXU
             SpMM, Pallas block-sparse kernels.  The native tier replacing
             the reference's torch_scatter/torch_sparse CUDA substrate.
  spectral/  host-side (numpy/scipy) one-time preprocessing: magnetic and
             signed magnetic Laplacians, DiGCN PPR adjacencies, spectral
             node features.
  data/      SignedData / DirectedData containers, SSBM / polarized SSBM /
             DSBM / SDSBM generators, real-dataset loaders.
  utils/     node & link splits, task losses, degree features, evaluation.
  nn/        Flax conv layers and the full model zoo.
  parallel/  jax.sharding mesh utilities, edge-partitioned SpMM via
             shard_map for multi-chip scaling.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from . import graph  # noqa: F401
from . import spectral  # noqa: F401
from . import utils  # noqa: F401
from . import data  # noqa: F401
from . import nn  # noqa: F401

__all__ = ["ops", "graph", "spectral", "utils", "data", "nn", "__version__"]
