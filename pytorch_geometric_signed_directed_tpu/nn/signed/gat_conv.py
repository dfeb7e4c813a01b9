"""Single-head GAT convolution over a static padded edge structure.

TPU equivalent of the PyG GATConv used inside SiGAT / SDGNN (reference
nn/signed/SiGAT.py:62, SDGNN.py:35): gather + segment-softmax attention on
an AttnGraph (self-loops baked in at build time).
"""
import jax.numpy as jnp
import flax.linen as nn

from .snea_conv import (
    AttnGraph,
    attention_softmax_aggregate,
    build_attention_graph,
)

_glorot = nn.initializers.xavier_uniform()


def gat_graph(edge_index, num_nodes: int) -> AttnGraph:
    """Edge structure + self-loops for every node (PyG add_self_loops)."""
    return build_attention_graph([(edge_index, 0, True)], num_nodes)


class GATConv(nn.Module):
    out_dim: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: AttnGraph) -> jnp.ndarray:
        n = g.num_nodes
        h = nn.Dense(self.out_dim, use_bias=False, kernel_init=_glorot)(x)
        att_src = self.param("att_src", _glorot, (self.out_dim, 1))
        att_dst = self.param("att_dst", _glorot, (self.out_dim, 1))
        a_src = (h @ att_src)[:, 0]
        a_dst = (h @ att_dst)[:, 0]
        from ...parallel.attn_shard import (
            ShardedAttnGraph,
            sharded_attention_apply,
        )

        if isinstance(g, ShardedAttnGraph):
            def edge_fn(src, dst, ep, valid):
                logits = nn.leaky_relu(a_src[src] + a_dst[dst],
                                       self.negative_slope)
                return logits, h[src]

            out = sharded_attention_apply(g, edge_fn)
        else:
            src = jnp.minimum(g.src, n - 1)
            dst_safe = jnp.minimum(g.dst, n - 1)
            logits = nn.leaky_relu(a_src[src] + a_dst[dst_safe],
                                   self.negative_slope)
            out = attention_softmax_aggregate(g, logits, h[src])
        return out + self.param("bias", nn.initializers.zeros, (self.out_dim,))
