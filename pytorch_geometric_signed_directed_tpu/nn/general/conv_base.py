"""Conv_Base: row-normalized unweighted-parameter propagation.

Reference: nn/general/conv_base.py:12-117.  The conv_norm_rw normalization
(D^-1 (A + fill*I), flow target_to_source) is frozen into a Propagator by
graph.rw_norm_propagator; the layer itself is pure operator application.
"""
from ...graph import rw_norm_propagator  # noqa: F401  (public re-export)
from ...ops.spmm import Propagator


class Conv_Base:
    """``Conv_Base()(x, P)`` == ``P(x)`` with P from rw_norm_propagator."""

    def __init__(self, fill_value: float = 0.5):
        self.fill_value = fill_value

    def __call__(self, x, P: Propagator):
        return P(x)
