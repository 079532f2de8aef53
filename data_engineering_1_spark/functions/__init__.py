"""Column-level kernels (vector math, text scalar helpers)."""
