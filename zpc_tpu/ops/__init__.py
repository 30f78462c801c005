"""Pallas TPU kernels (hand-written hot ops)."""
