"""Pallas TPU kernels for the hot tracking path."""
