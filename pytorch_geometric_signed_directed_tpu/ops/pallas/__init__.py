"""Pallas TPU kernels: the hand-written native tier under ops/."""

from .bsr_spmm import BSR, bsr_from_coo, bsr_spmm

__all__ = ["BSR", "bsr_from_coo", "bsr_spmm"]
