"""Native sparse tier: static-shape COO, segment primitives, tiered SpMM."""

from .coo import COO, build_coo, coo_from_scipy
from .segment import segment_sum, segment_mean, segment_max, segment_softmax
from .spmm import (
    DualPropagator,
    Propagator,
    complex_spmm,
    dual_propagator,
    dual_spmm,
    make_propagator,
    propagator_from_coo,
    propagators_from_dual,
    spmm_coo,
)

__all__ = [
    "COO",
    "build_coo",
    "coo_from_scipy",
    "segment_sum",
    "segment_mean",
    "segment_max",
    "segment_softmax",
    "DualPropagator",
    "Propagator",
    "complex_spmm",
    "dual_propagator",
    "dual_spmm",
    "make_propagator",
    "propagator_from_coo",
    "propagators_from_dual",
    "spmm_coo",
]
