"""Utilities: profiling/tracing, misc helpers."""
