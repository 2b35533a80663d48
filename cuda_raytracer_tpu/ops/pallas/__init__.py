"""Pallas TPU kernels for the wavefront hot path."""
