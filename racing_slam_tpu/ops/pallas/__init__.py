"""Pallas TPU kernels for the hot inner loops."""
