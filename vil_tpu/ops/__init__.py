"""Functional compute cores: sliding-chunk attention, masks, RPE tables."""
from . import masks, rpe, sliding_chunk

__all__ = ["masks", "rpe", "sliding_chunk"]
