"""Scalar/vectorized function kernels (the engine's expression library)."""
