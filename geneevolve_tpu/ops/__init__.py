"""Pallas TPU kernels for the hot ops (XLA implementations in `dense/` and
`core/` remain the oracles and fallbacks)."""
