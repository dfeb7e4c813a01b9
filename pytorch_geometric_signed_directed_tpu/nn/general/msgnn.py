"""MSGNN: link-prediction and node-classification heads over MSConv.

Reference: nn/general/MSGNN.py:10-189.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..directed.complex_relu import complex_relu
from ..normalize import l2_normalize
from .msconv import MSConv
from ...ops.spmm import Propagator
from ...spectral.magnetic import MagneticTemplate

Lap = Union[Tuple[Propagator, Propagator], MagneticTemplate]


class _MSGNNTrunk(nn.Module):
    num_features: int
    hidden: int
    q: float
    K: int
    activation: bool
    trainable_q: bool
    layer: int
    normalization: Optional[str]
    conv_bias: bool = True
    absolute_degree: bool = True

    @nn.compact
    def __call__(self, real, imag, lap: Lap):
        for i in range(self.layer):
            real, imag = MSConv(
                in_channels=self.num_features if i == 0 else self.hidden,
                out_channels=self.hidden, K=self.K, q=self.q,
                trainable_q=self.trainable_q,
                normalization=self.normalization, bias=self.conv_bias,
                absolute_degree=self.absolute_degree,
            )(real, imag, lap)
            if self.activation:
                real, imag = complex_relu(real, imag)
        return real, imag


class MSGNN_link_prediction(nn.Module):
    """MSGNN link prediction (LoG'22): MagNet-style trunk over the SIGNED
    magnetic Laplacian (MSConv); exposes the pre-head embedding as
    aux output like the reference's self.z.

    Reference: nn/general/MSGNN.py:10-88.
    """

    num_features: int
    hidden: int = 2
    q: float = 0.25
    K: int = 2
    label_dim: int = 2
    activation: bool = True
    trainable_q: bool = False
    layer: int = 2
    dropout: float = 0.5
    normalization: Optional[str] = "sym"
    conv_bias: bool = True
    absolute_degree: bool = True

    @nn.compact
    def __call__(self, real, imag, lap: Lap, query_edges,
                 training: bool = False):
        real, imag = _MSGNNTrunk(
            self.num_features, self.hidden, self.q, self.K, self.activation,
            self.trainable_q, self.layer, self.normalization, self.conv_bias,
            self.absolute_degree)(real, imag, lap)
        x = jnp.concatenate(
            [real[query_edges[:, 0]], real[query_edges[:, 1]],
             imag[query_edges[:, 0]], imag[query_edges[:, 1]]], axis=-1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        z = x  # pre-head embedding, the reference's ``self.z`` (:88)
        x = nn.Dense(self.label_dim)(x)
        return nn.log_softmax(x, axis=1), z


class MSGNN_node_classification(nn.Module):
    """MSGNN node classification: MSConv trunk; returns the DIGRAC-style
    4-tuple (embedding, log-prob, preds, prob).

    Reference: nn/general/MSGNN.py:91-189.
    """

    num_features: int
    hidden: int = 2
    q: float = 0.25
    K: int = 2
    label_dim: int = 2
    activation: bool = True
    trainable_q: bool = False
    layer: int = 2
    dropout: float = 0.5
    normalization: Optional[str] = "sym"
    conv_bias: bool = True
    absolute_degree: bool = True

    @nn.compact
    def __call__(self, real, imag, lap: Lap, training: bool = False):
        real, imag = _MSGNNTrunk(
            self.num_features, self.hidden, self.q, self.K, self.activation,
            self.trainable_q, self.layer, self.normalization, self.conv_bias,
            self.absolute_degree)(real, imag, lap)
        x = jnp.concatenate([real, imag], axis=-1)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        z = x
        x = nn.Dense(self.label_dim)(x)
        log_prob = nn.log_softmax(x, axis=1)
        predictions_cluster = jnp.argmax(log_prob, axis=1)
        prob = jax.nn.softmax(x, axis=1)
        z_norm = l2_normalize(z)
        return z_norm, log_prob, predictions_cluster, prob
