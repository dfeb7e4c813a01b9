from .meta_graph import meta_graph_generation
from .prob_imbalance_loss import Prob_Imbalance_Loss
from .digcl_utils import drop_feature, pred_digcl_link, pred_digcl_node
from ...spectral import (
    cal_fast_appr,
    fast_appr_power,
    magnetic_laplacian as get_magnetic_Laplacian,
    appr_directed_adj as get_appr_directed_adj,
    second_directed_adj as get_second_directed_adj,
)
from ...graph import directed_features_in_out

__all__ = [
    "meta_graph_generation",
    "Prob_Imbalance_Loss",
    "drop_feature",
    "pred_digcl_link",
    "pred_digcl_node",
    "cal_fast_appr",
    "fast_appr_power",
    "get_magnetic_Laplacian",
    "get_appr_directed_adj",
    "get_second_directed_adj",
    "directed_features_in_out",
]
