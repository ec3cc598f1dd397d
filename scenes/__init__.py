"""Benchmark scene definitions — the five BASELINE.json configs.

Each module exposes `build(**overrides) -> Scene`. Overrides let tests
render tiny/low-spp variants of the same geometry.
"""
