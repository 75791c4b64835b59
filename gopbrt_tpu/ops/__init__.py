"""Numeric kernels: geometry, intersection, acceleration, sampling, BSDFs."""
