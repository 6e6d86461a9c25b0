"""L1: Pallas/Mosaic TPU kernels (SURVEY.md §2.2, T-K1/T-K2/T-C3)."""

from blockcg_tpu.ops import stencil

__all__ = ["stencil"]
