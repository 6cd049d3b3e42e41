"""TPU kernels and fused ops (Pallas + XLA)."""

from .temporal_shift import temporal_pool, temporal_shift, temporal_shift_pallas

__all__ = ["temporal_pool", "temporal_shift", "temporal_shift_pallas"]
