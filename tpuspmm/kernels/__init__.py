"""Optimized Pallas TPU kernels for SpMM."""
