"""Compute-path ops: decode loops and (later) Pallas kernels."""
