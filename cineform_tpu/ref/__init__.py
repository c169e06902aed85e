"""NumPy scalar golden reference — the bit-exact oracle for device kernels."""
