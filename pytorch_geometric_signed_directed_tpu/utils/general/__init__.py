from .node_split import node_class_split
from .link_split import link_class_split
from .extract_network import extract_network
from .triplet_loss import Triplet_Loss_InnerProduct, triplet_loss_node_classification
from .evaluation import (
    link_sign_direction_prediction_logistic_function,
    link_sign_prediction_logistic_function,
)
from ...graph import in_out_degree

__all__ = [
    "node_class_split",
    "link_class_split",
    "extract_network",
    "Triplet_Loss_InnerProduct",
    "triplet_loss_node_classification",
    "link_sign_direction_prediction_logistic_function",
    "link_sign_prediction_logistic_function",
    "in_out_degree",
]
