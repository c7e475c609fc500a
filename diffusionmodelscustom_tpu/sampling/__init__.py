"""Samplers: fused-scan ancestral, DDIM fast path, EDM churn (cascade)."""

from .ancestral import ancestral_sample, ddim_sample

__all__ = ["ancestral_sample", "ddim_sample"]
