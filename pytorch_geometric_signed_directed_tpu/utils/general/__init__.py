from .node_split import node_class_split
from .link_split import link_class_split
from .extract_network import extract_network
from .triplet_loss import Triplet_Loss_InnerProduct, triplet_loss_node_classification
from .evaluation import (
    link_sign_direction_prediction_logistic_function,
    link_sign_prediction_logistic_function,
)
from ...graph import in_out_degree
from ...spectral import magnetic_signed_laplacian as get_magnetic_signed_Laplacian
from ...ops.coo import coo_from_scipy as scipy_sparse_to_jax_coo

# the reference's torch-specific converter; here scipy -> padded COO pytree
scipy_sparse_to_torch_sparse = scipy_sparse_to_jax_coo

__all__ = [
    "node_class_split",
    "link_class_split",
    "extract_network",
    "Triplet_Loss_InnerProduct",
    "triplet_loss_node_classification",
    "link_sign_direction_prediction_logistic_function",
    "link_sign_prediction_logistic_function",
    "in_out_degree",
    "get_magnetic_signed_Laplacian",
    "scipy_sparse_to_jax_coo",
    "scipy_sparse_to_torch_sparse",
]
