"""Pallas TPU kernels for the hot ops (factor-grid encoding, fused eval)."""
