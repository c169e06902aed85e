"""Entropy coding: zero-run + Huffman VLC (host bit-exact path + TPU scan path)."""
