"""MSConv: MagNetConv generalized to the signed magnetic Laplacian.

Reference: nn/general/MSConv.py:12-239.  The Chebyshev recurrence is
byte-identical to MagNetConv's (same 2-stream reduction applies — see
nn/directed/magnet_conv.py); only the Laplacian differs (signed weights,
absolute-degree normalization), which lives in
spectral.magnet_propagators(signed=True) / magnetic_template(signed=True).
"""
from typing import Optional

from ..directed.magnet_conv import MagNetConv


class MSConv(MagNetConv):
    """Same module as MagNetConv; pass propagators/templates built with
    ``signed=True`` (and the desired ``absolute_degree``)."""

    absolute_degree: bool = True
