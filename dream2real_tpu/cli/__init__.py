"""Command-line entry points (demo, experiments, selftest)."""
