"""Normalization kernel: housenumber / street-name / key normalization.

Column-expression-first (JVM codegen); SQL-string twins for the DuckDB
oracle where the contract needs them.
"""
