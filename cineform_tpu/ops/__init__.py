"""JAX/XLA/Pallas device kernels for the CFHD codec pipeline."""
