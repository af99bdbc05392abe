"""Text-analysis + deduplication operators for the training-data pipeline.

Beyond reference parity (SURVEY.md §2), a 100 TB training-data engine needs
document-level text ops: language ID, quality scoring, token stats,
fingerprinting, exact + near dedup (MinHash/LSH, SimHash, n-gram Jaccard).
All operators are pure Spark column expressions (whole-stage codegen, no
Python UDFs) whose arithmetic is bit-reproducible in ANSI SQL, so every one
has a DuckDB oracle in text/oracles.py.
"""
