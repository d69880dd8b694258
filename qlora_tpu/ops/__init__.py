"""Compute ops: fused Pallas kernels + XLA fallbacks."""

from .qmatmul import qmatmul

__all__ = ["qmatmul"]
