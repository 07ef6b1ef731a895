"""Perception orchestration: segmentation (SAM/XMem) and captioning (BLIP-2).

Per the north star (BASELINE.json), these stay orchestration-level external
models; the cache formats match the reference so cached artifacts replay.
"""
