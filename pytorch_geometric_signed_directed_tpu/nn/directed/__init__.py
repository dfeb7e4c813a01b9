from .complex_relu import complex_relu, complex_relu_layer
from .magnet_conv import MagNetConv
from .magnet import MagNet_link_prediction, MagNet_node_classification
from .dgcn import DGCNConv, DGCN_link_prediction, DGCN_node_classification
from .digcn import (
    DiGCNConv,
    DiGCN_Inception_Block,
    DiGCN_Inception_Block_link_prediction,
    DiGCN_Inception_Block_node_classification,
    DiGCN_link_prediction,
    DiGCN_node_classification,
)
from .dimpa import DIMPA, DIGRAC_node_clustering
from .digcl import DiGCL, DiGCL_Encoder

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
]
