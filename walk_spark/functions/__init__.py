"""Scalar/vectorized kernels: URL canonicalization, HTML extraction,
mime sniffing, content hashing, text analysis."""
