"""Deterministic hash primitives shared by the Spark engine and SQL oracles.

Every constant here is derived from md5 at import time and inlined as a
literal into BOTH the Spark expression and the DuckDB oracle SQL, so the two
engines compute bit-identical integers. The 60-bit md5 prefix
(15 hex chars < 2^60) is the universal string hash; 31-bit reductions feed
the MinHash permutations (a*h+b mod 2^31-1 stays inside int64).
"""

from __future__ import annotations

import hashlib

MERSENNE31 = (1 << 31) - 1  # MinHash permutation modulus

MINHASH_N = 32  # signature length
MINHASH_BANDS = 8  # LSH bands
MINHASH_ROWS = 4  # rows per band (threshold ~ (1/b)^(1/r) ~ 0.59)

SIMHASH_BITS = 60  # fits the 60-bit md5-prefix hash
SIMHASH_BANDS = 6  # 10-bit bands for candidate generation
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS

ROLLING_BASE = 131  # polynomial rolling-hash base (acc*131+h mod p)


def _const(tag: str, mod: int, offset: int = 0) -> int:
    """Deterministic pseudo-random constant from an md5 tag."""
    return int(hashlib.md5(tag.encode()).hexdigest()[:15], 16) % mod + offset


MINHASH_A = tuple(_const(f"mh_a_{i}", MERSENNE31 - 1, 1) for i in range(MINHASH_N))
MINHASH_B = tuple(_const(f"mh_b_{i}", MERSENNE31) for i in range(MINHASH_N))


def h60_spark(expr: str) -> str:
    """Spark SQL: 60-bit int64 hash of a string expression."""
    return f"cast(conv(substring(md5({expr}), 1, 15), 16, 10) as bigint)"


def h60_duck(expr: str) -> str:
    """DuckDB SQL: identical 60-bit hash (verified bit-equal to h60_spark)."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def tokens_spark(expr: str = "text") -> str:
    # filter(...): Java split keeps a leading empty field, so whitespace-only
    # text would count 1 phantom token and '\tword' would count 2 (trim
    # strips only spaces) — systematically skewing every token statistic
    # and budget. The DuckDB twin applies the identical filter.
    return f"filter(split(trim({expr}), '\\\\s+'), x -> x != '')"


def tokens_duck(expr: str = "text") -> str:
    return (
        f"list_filter(regexp_split_to_array(trim({expr}), '\\s+'), "
        "x -> x != '')"
    )
