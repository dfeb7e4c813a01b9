"""Task utilities: splits, losses, sampling, degree features, evaluation.

Public names mirror the reference's ``utils`` namespace
(torch_geometric_signed_directed/utils/{general,signed,directed}/__init__.py).
"""

from .general.node_split import node_class_split
from .general.link_split import link_class_split
from .general.extract_network import extract_network
from .general.triplet_loss import Triplet_Loss_InnerProduct, triplet_loss_node_classification
from .general.evaluation import (
    link_sign_direction_prediction_logistic_function,
    link_sign_prediction_logistic_function,
)
from .directed.meta_graph import meta_graph_generation
from .directed.prob_imbalance_loss import Prob_Imbalance_Loss
from .directed.digcl_utils import drop_feature, pred_digcl_link, pred_digcl_node
from .signed.sampling import negative_sampling, structured_negative_sampling
from .signed.link_sign_loss import (
    Link_Sign_Entropy_Loss,
    Link_Sign_Product_Loss,
    Sign_Direction_Loss,
    Sign_Product_Entropy_Loss,
    Sign_Structure_Loss,
    Sign_Triangle_Loss,
)
from .signed.balanced_loss import (
    Prob_Balanced_Normalized_Loss,
    Prob_Balanced_Ratio_Loss,
    Unhappy_Ratio,
)
from ..graph import in_out_degree, directed_features_in_out
from ..spectral import (
    cal_fast_appr,
    create_spectral_features,
    magnetic_laplacian as get_magnetic_Laplacian,
    magnetic_signed_laplacian as get_magnetic_signed_Laplacian,
    appr_directed_adj as get_appr_directed_adj,
    second_directed_adj as get_second_directed_adj,
    fast_appr_power,
)

__all__ = [
    "node_class_split",
    "link_class_split",
    "extract_network",
    "Triplet_Loss_InnerProduct",
    "triplet_loss_node_classification",
    "link_sign_direction_prediction_logistic_function",
    "link_sign_prediction_logistic_function",
    "meta_graph_generation",
    "Prob_Imbalance_Loss",
    "drop_feature",
    "pred_digcl_link",
    "pred_digcl_node",
    "negative_sampling",
    "structured_negative_sampling",
    "Link_Sign_Entropy_Loss",
    "Link_Sign_Product_Loss",
    "Sign_Direction_Loss",
    "Sign_Product_Entropy_Loss",
    "Sign_Structure_Loss",
    "Sign_Triangle_Loss",
    "Prob_Balanced_Normalized_Loss",
    "Prob_Balanced_Ratio_Loss",
    "Unhappy_Ratio",
    "in_out_degree",
    "directed_features_in_out",
    "cal_fast_appr",
    "create_spectral_features",
    "get_magnetic_Laplacian",
    "get_magnetic_signed_Laplacian",
    "get_appr_directed_adj",
    "get_second_directed_adj",
    "fast_appr_power",
]
