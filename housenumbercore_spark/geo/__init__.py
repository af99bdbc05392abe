"""Geo kernel: cell grid, geometry ops (pure numpy), CRS, distance."""
