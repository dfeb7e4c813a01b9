from .sampling import negative_sampling, structured_negative_sampling
from .link_sign_loss import (
    Link_Sign_Entropy_Loss,
    Link_Sign_Product_Loss,
    Sign_Direction_Loss,
    Sign_Product_Entropy_Loss,
    Sign_Structure_Loss,
    Sign_Triangle_Loss,
)
from .balanced_loss import (
    Prob_Balanced_Normalized_Loss,
    Prob_Balanced_Ratio_Loss,
    Unhappy_Ratio,
)
from ...spectral.features import create_spectral_features
from ..general.evaluation import link_sign_prediction_logistic_function

__all__ = [
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
    "create_spectral_features",
    "link_sign_prediction_logistic_function",
]
