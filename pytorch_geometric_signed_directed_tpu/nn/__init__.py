"""Model zoo: Flax conv layers + the full reference model family.

Public names mirror the reference library's ``nn`` namespace
(torch_geometric_signed_directed/nn/{directed,signed,general}/__init__.py)
so a reference user finds the same models here.
"""

from .directed.complex_relu import complex_relu, complex_relu_layer
from .directed.magnet_conv import MagNetConv
from .directed.magnet import MagNet_link_prediction, MagNet_node_classification
from .directed.dgcn import DGCNConv, DGCN_link_prediction, DGCN_node_classification
from .directed.digcn import (
    DiGCNConv,
    DiGCN_Inception_Block,
    DiGCN_Inception_Block_link_prediction,
    DiGCN_Inception_Block_node_classification,
    DiGCN_link_prediction,
    DiGCN_node_classification,
)
from .directed.dimpa import DIMPA, DIGRAC_node_clustering
from .directed.digcl import DiGCL, DiGCL_Encoder
from .general.conv_base import Conv_Base, rw_norm_propagator
from ..graph import adj_dual_propagator, rw_norm_dual_propagator
from .signed.sgcn import sgcn_dual_propagator
from .general.msconv import MSConv
from .general.msgnn import MSGNN_link_prediction, MSGNN_node_classification
from .signed.sgcn_conv import SGCNConv
from .signed.sgcn import SGCN
from .signed.snea_conv import SNEAConv
from .signed.snea import SNEA
from .signed.simpa import SIMPA
from .signed.sssnet import SSSNET_link_prediction, SSSNET_node_clustering
from .signed.sigat import SiGAT
from .signed.sdgnn import SDGNN

__all__ = [
    "complex_relu",
    "complex_relu_layer",
    "MagNetConv",
    "MagNet_link_prediction",
    "MagNet_node_classification",
    "DGCNConv",
    "DGCN_link_prediction",
    "DGCN_node_classification",
    "DiGCNConv",
    "DiGCN_Inception_Block",
    "DiGCN_Inception_Block_link_prediction",
    "DiGCN_Inception_Block_node_classification",
    "DiGCN_link_prediction",
    "DiGCN_node_classification",
    "DIMPA",
    "DIGRAC_node_clustering",
    "DiGCL",
    "DiGCL_Encoder",
    "Conv_Base",
    "rw_norm_propagator",
    "adj_dual_propagator",
    "rw_norm_dual_propagator",
    "sgcn_dual_propagator",
    "MSConv",
    "MSGNN_link_prediction",
    "MSGNN_node_classification",
    "SGCNConv",
    "SGCN",
    "SNEAConv",
    "SNEA",
    "SIMPA",
    "SSSNET_link_prediction",
    "SSSNET_node_clustering",
    "SiGAT",
    "SDGNN",
]
