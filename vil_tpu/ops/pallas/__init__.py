"""Pallas TPU kernels (fused sliding-chunk attention)."""
from .vil_kernel import make_fused_vil_attention_mh, mask_to_additive

__all__ = ["make_fused_vil_attention_mh", "mask_to_additive"]
