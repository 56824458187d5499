"""Pallas TPU kernels (fused attention with factored relative-frame bias)."""
