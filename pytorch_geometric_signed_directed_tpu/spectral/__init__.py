"""Host-side spectral preprocessing (numpy/scipy) — runs once per dataset.

The reference does all of this on CPU too (SURVEY.md §3.2): magnetic
Laplacians, PPR adjacencies and spectral features are one-time graph
preprocessing, kept off the jitted TPU hot path.
"""

from .magnetic import (
    MagneticTemplate,
    magnetic_laplacian,
    magnetic_signed_laplacian,
    magnet_propagators,
    magnetic_template,
    template_dual,
    template_dual_apply,
    template_propagators,
)
from .appr import (
    appr_directed_adj,
    second_directed_adj,
    fast_appr_power,
    cal_fast_appr,
)
from .features import (
    create_spectral_features,
    hermitian_features,
    signed_laplacian_eig_features,
    spectral_adjacency_reg_features,
)

__all__ = [
    "MagneticTemplate",
    "magnetic_laplacian",
    "magnetic_signed_laplacian",
    "magnet_propagators",
    "magnetic_template",
    "template_dual",
    "template_dual_apply",
    "template_propagators",
    "appr_directed_adj",
    "second_directed_adj",
    "fast_appr_power",
    "cal_fast_appr",
    "create_spectral_features",
    "hermitian_features",
    "signed_laplacian_eig_features",
    "spectral_adjacency_reg_features",
]
