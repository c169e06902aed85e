"""Host-side utilities: image I/O, metrics, deterministic RNG models."""
