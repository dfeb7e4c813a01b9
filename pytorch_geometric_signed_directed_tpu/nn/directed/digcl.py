"""DiGCL: directed graph contrastive learning.

Reference: nn/directed/DiGCL.py:7-199.

The per-epoch PPR graph views (spectral.cal_fast_appr with a varying alpha)
are built host-side and passed in as gcn-normalized Propagators
(graph.gcn_norm_propagator, mirroring the reference's PyG GCNConv which
re-normalizes its input).  Using the dense tier keeps the jitted step's
shapes constant across epochs even though each view has a different edge
count — no recompiles.
"""
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ...ops.spmm import Propagator
from ..normalize import l2_normalize


class _GCNConv(nn.Module):
    """PyG-style GCNConv body: x @ W -> propagate -> + bias (the gcn_norm
    lives in the Propagator).  Glorot kernel init like PyG's
    (reset_parameters -> glorot), zeros bias."""

    out_channels: int

    @nn.compact
    def __call__(self, x, P: Propagator):
        x = nn.Dense(self.out_channels, use_bias=False,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return P(x) + self.param("bias", nn.initializers.zeros,
                                 (self.out_channels,))


class _TorchLinear(nn.Module):
    """torch.nn.Linear-equivalent init: weight AND bias both
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) (flax kernels are [fan_in, out])."""

    out_features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        init = nn.initializers.uniform(scale=2 * bound)
        kernel = self.param("kernel", lambda k, s: init(k, s) - bound,
                            (fan_in, self.out_features))
        bias = self.param("bias", lambda k, s: init(k, s) - bound,
                          (self.out_features,))
        return x @ kernel + bias


class _PReLU(nn.Module):
    """torch.nn.PReLU equivalent: one trainable slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, slope * x)


# torch RReLU samples the negative slope in [1/8, 1/3] during training and
# uses the mean in eval; we use the mean slope throughout (deterministic).
_RRELU_SLOPE = (1.0 / 8 + 1.0 / 3) / 2


class DiGCL_Encoder(nn.Module):
    """GCN encoder for DiGCL (2+ conv layers over a PPR view).

    Reference: nn/directed/DiGCL.py:7-57.
    """

    in_channels: int
    out_channels: int
    activation: str = "relu"
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, P: Propagator):
        assert self.num_layers >= 2
        if self.activation == "prelu":
            act = _PReLU()
        elif self.activation == "rrelu":
            act = lambda v: nn.leaky_relu(v, _RRELU_SLOPE)
        else:
            act = nn.relu
        for _ in range(self.num_layers - 1):
            x = act(_GCNConv(2 * self.out_channels)(x, P))
        return act(_GCNConv(self.out_channels)(x, P))


class DiGCL(nn.Module):
    """Directed graph contrastive learning (NeurIPS'21): encoder +
    projection MLP with InfoNCE semi/batched losses between two PPR
    views.

    Reference: nn/directed/DiGCL.py:60-199.
    """

    in_channels: int
    activation: str
    num_hidden: int
    num_proj_hidden: int
    tau: float
    num_layers: int

    def setup(self):
        self.encoder = DiGCL_Encoder(self.in_channels, self.num_hidden,
                                     self.activation, self.num_layers)
        # projection head inits follow torch.nn.Linear (the reference uses
        # plain Linear layers here, not PyG modules)
        self.fc1 = _TorchLinear(self.num_proj_hidden)
        self.fc2 = _TorchLinear(self.num_hidden)

    def __call__(self, x, P: Propagator):
        return self.encoder(x, P)

    def warmup(self, x, P: Propagator):
        """Touches every submodule; use as the ``method=`` for .init()."""
        return self.projection(self.encoder(x, P))

    def projection(self, z):
        return self.fc2(nn.elu(self.fc1(z)))

    @staticmethod
    def sim(z1, z2):
        z1 = l2_normalize(z1)
        z2 = l2_normalize(z2)
        return z1 @ z2.T

    def semi_loss(self, z1, z2):
        f = lambda x: jnp.exp(x / self.tau)
        refl_sim = f(self.sim(z1, z1))
        between_sim = f(self.sim(z1, z2))
        return -jnp.log(
            jnp.diag(between_sim)
            / (refl_sim.sum(1) + jnp.diag(between_sim) - jnp.diag(refl_sim))
        )

    def batched_semi_loss(self, z1, z2, batch_size: int):
        # O(BN) memory; lax.map over batches keeps one compiled body.
        num_nodes = z1.shape[0]
        num_batches = (num_nodes - 1) // batch_size + 1
        f = lambda x: jnp.exp(x / self.tau)
        pad = num_batches * batch_size - num_nodes
        idx = jnp.arange(num_batches * batch_size)
        valid = idx < num_nodes
        idx = jnp.minimum(idx, num_nodes - 1).reshape(num_batches, batch_size)

        @jax.checkpoint
        def body(mask_idx):
            # rematerialized: without checkpoint the lax.map backward
            # stores every batch's [B, N] similarity blocks
            # (num_batches x 2 x B x N floats — ~17 GB at N=65536,
            # B=4096), overflowing HBM; recomputing them in the
            # backward trades ~2x the matmul FLOPs for O(B*N) memory
            zb = z1[mask_idx]
            refl = f(self.sim(zb, z1))  # [B, N]
            between = f(self.sim(zb, z2))
            diag_between = between[jnp.arange(batch_size), mask_idx]
            diag_refl = refl[jnp.arange(batch_size), mask_idx]
            return -jnp.log(diag_between
                            / (refl.sum(1) + between.sum(1) - diag_refl))

        losses = jax.lax.map(body, idx).reshape(-1)
        # zero the padded tail (jit-safe static shapes); loss() renormalizes
        # by the true node count.
        return jnp.where(valid, losses, 0.0)

    def loss(self, z1, z2, mean: bool = True, batch_size: int = 0):
        h1 = self.projection(z1)
        h2 = self.projection(z2)
        if batch_size == 0:
            l1 = self.semi_loss(h1, h2)
            l2 = self.semi_loss(h2, h1)
        else:
            l1 = self.batched_semi_loss(h1, h2, batch_size)
            l2 = self.batched_semi_loss(h2, h1, batch_size)
        ret = (l1 + l2) * 0.5
        total = ret.sum()
        return total / z1.shape[0] if mean else total
