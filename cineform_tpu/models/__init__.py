"""Codec pipelines: host oracle (intra_host) and TPU/JAX production path."""
