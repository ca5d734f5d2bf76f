"""Pallas TPU kernels for the hot physics path."""
