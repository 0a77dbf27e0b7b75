"""Utilities: config system, checkpoint import, profiling."""
