from .sgcn_conv import SGCNConv
from .sgcn import SGCN
from .snea_conv import SNEAConv, AttnGraph, build_attention_graph, snea_graphs
from .snea import SNEA
from .simpa import SIMPA
from .sssnet import SSSNET_link_prediction, SSSNET_node_clustering
from .sigat import SiGAT
from .sdgnn import SDGNN

__all__ = [
    "SGCNConv",
    "SGCN",
    "SNEAConv",
    "AttnGraph",
    "build_attention_graph",
    "snea_graphs",
    "SNEA",
    "SIMPA",
    "SSSNET_link_prediction",
    "SSSNET_node_clustering",
    "SiGAT",
    "SDGNN",
]
