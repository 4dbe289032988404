"""Compute kernels (JAX/XLA + Pallas) for the wavefront path tracer."""
