from .conv_base import Conv_Base, rw_norm_propagator
from .msconv import MSConv
from .msgnn import MSGNN_link_prediction, MSGNN_node_classification

__all__ = [
    "Conv_Base",
    "rw_norm_propagator",
    "MSConv",
    "MSGNN_link_prediction",
    "MSGNN_node_classification",
]
