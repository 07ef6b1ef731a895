"""Visualisation utilities (offline exports; TPU hosts are headless)."""
