"""Pallas TPU kernels for the decode hot path."""

from .fused_decode import fused_heatmap_decode

__all__ = ["fused_heatmap_decode"]
