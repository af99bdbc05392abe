"""Spatial + relational operators of the engine."""
