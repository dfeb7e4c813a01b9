"""Data containers, synthetic SBM generators, and real-data loaders.

Public names mirror the reference's ``data`` namespace
(torch_geometric_signed_directed/data/__init__.py).
"""

from .signed_data import SignedData
from .directed_data import DirectedData
from .ssbm import SSBM, fill
from .polarized_ssbm import polarized_SSBM
from .dsbm import DSBM
from .sdsbm import SDSBM
from .load_real import (
    load_directed_real_data,
    load_signed_real_data,
    SDGNN_real_data,
    SSSNET_real_data,
    MSGNN_real_data,
    DIGRAC_real_data,
    Citeseer,
    Cora_ml,
    Telegram,
    WebKB,
    WikiCS,
    WikipediaNetwork,
)

__all__ = [
    "SignedData",
    "DirectedData",
    "SSBM",
    "fill",
    "polarized_SSBM",
    "DSBM",
    "SDSBM",
    "load_directed_real_data",
    "load_signed_real_data",
    "SDGNN_real_data",
    "SSSNET_real_data",
    "MSGNN_real_data",
    "DIGRAC_real_data",
    "Citeseer",
    "Cora_ml",
    "Telegram",
    "WebKB",
    "WikiCS",
    "WikipediaNetwork",
]
