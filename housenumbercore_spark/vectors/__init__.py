"""Embedding similarity search: brute-force cosine top-k (baseline) and
multi-table sign-LSH ANN (the 100 TB scale path), plus embedding-cosine
near-dup pairs. Arithmetic is integer-quantized so Spark and the DuckDB
oracle agree bit-for-bit regardless of summation order.
"""
