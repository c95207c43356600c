"""Pure-JAX compute kernels: geometry, matching, bundle adjustment."""
