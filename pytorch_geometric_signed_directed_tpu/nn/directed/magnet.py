"""MagNet node-classification / link-prediction models.

Reference: nn/directed/MagNet_node_classification.py:11-92 and
MagNet_link_prediction.py:11-89.  The 1x1 Conv1d head of the reference is a
plain Dense over concat(real, imag).
"""
from typing import Optional, Tuple, Union

import jax.numpy as jnp
import flax.linen as nn

from .complex_relu import complex_relu
from .magnet_conv import MagNetConv
from ...ops.spmm import Propagator
from ...spectral.magnetic import MagneticTemplate

Lap = Union[Tuple[Propagator, Propagator], MagneticTemplate]


class MagNet_node_classification(nn.Module):
    """MagNet node classification (NeurIPS'21): MagNetConv stack +
    complex ReLU, concat(real, imag) -> Dense head -> log_softmax.

    Reference: nn/directed/MagNet_node_classification.py:11-92 (the 1x1
    Conv1d head is a plain Dense over the concat).
    """

    num_features: int
    hidden: int = 2
    q: float = 0.25
    K: int = 1
    label_dim: int = 2
    activation: bool = False
    trainable_q: bool = False
    layer: int = 2
    dropout: float = 0.0
    normalization: Optional[str] = "sym"

    @nn.compact
    def __call__(self, real, imag, lap: Lap, training: bool = False):
        for i in range(self.layer):
            real, imag = MagNetConv(
                in_channels=self.num_features if i == 0 else self.hidden,
                out_channels=self.hidden, K=self.K, q=self.q,
                trainable_q=self.trainable_q,
                normalization=self.normalization,
            )(real, imag, lap)
            if self.activation:
                real, imag = complex_relu(real, imag)
        x = jnp.concatenate([real, imag], axis=-1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)


class MagNet_link_prediction(nn.Module):
    """MagNet link prediction: same trunk; gathers [real_s, real_t,
    imag_s, imag_t] at query_edges -> Dense(4*hidden) -> log_softmax.

    Reference: nn/directed/MagNet_link_prediction.py:11-89.
    """

    num_features: int
    hidden: int = 2
    q: float = 0.25
    K: int = 1
    label_dim: int = 2
    activation: bool = False
    trainable_q: bool = False
    layer: int = 2
    dropout: float = 0.0
    normalization: Optional[str] = "sym"

    @nn.compact
    def __call__(self, real, imag, lap: Lap, query_edges, training: bool = False):
        for i in range(self.layer):
            real, imag = MagNetConv(
                in_channels=self.num_features if i == 0 else self.hidden,
                out_channels=self.hidden, K=self.K, q=self.q,
                trainable_q=self.trainable_q,
                normalization=self.normalization,
            )(real, imag, lap)
            if self.activation:
                real, imag = complex_relu(real, imag)
        x = jnp.concatenate(
            [real[query_edges[:, 0]], real[query_edges[:, 1]],
             imag[query_edges[:, 0]], imag[query_edges[:, 1]]], axis=-1,
        )
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1)
