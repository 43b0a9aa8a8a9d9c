"""Compute kernels: plain-JAX stage engine and Pallas TPU kernels."""
